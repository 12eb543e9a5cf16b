"""Multi-process (multi-host) counting: real jax.distributed groups.

The reference is single-node only (SURVEY.md §2c); the multi-host path
(parallel/multihost.py) is the DCN half of the TPU replacement design.
These tests spawn REAL process groups (Gloo collectives over loopback
stand in for DCN) and byte-compare the distributed glistmaker output
against the reference binary and the single-process pipeline.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from tests.conftest import random_fasta, run_reference

DRIVER = Path(__file__).resolve().parent / "_mh_driver.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_group(nprocs, local_devices, wordlen, outname, inputs, cwd):
    env = dict(os.environ)
    repo_root = str(DRIVER.parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), coord, str(nprocs), str(i),
             str(wordlen), outname] + [str(p) for p in inputs],
            env=env, cwd=cwd,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"driver failed rc={rc}\n{err.decode()[-2000:]}"


@pytest.mark.parametrize("nprocs,local", [(2, 2), (2, 1), (4, 2)])
def test_multihost_glistmaker_byte_identical(tmp_path, rng, nprocs, local):
    """2-process mesh output == reference bytes, multi-file input
    (exercises the cross-slab shard merge)."""
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text(random_fasta(rng, 3, 3000, 6000, n_prob=0.01))
    f2.write_text(random_fasta(rng, 2, 2000, 4000))

    ref = run_reference(["glistmaker", str(f1), str(f2), "-w", "16",
                         "-o", str(tmp_path / "ref")], cwd=tmp_path)
    assert ref.returncode == 0, ref.stderr.decode()
    expected = (tmp_path / "ref_16.list").read_bytes()

    _run_group(nprocs, local, 16, str(tmp_path / "mh"), [f1, f2], tmp_path)
    got = (tmp_path / "mh_16.list").read_bytes()
    assert got == expected
