"""Differential tests for the .index format: glistmaker --index output
byte-identity, glistquery index queries, glistcompare index inputs."""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import run_reference, random_fasta, random_fastq


def run_cli(module_main, args):
    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = module_main(args)
        out = sys.stdout.getvalue()
    finally:
        sys.stdout = old
    return rc, out


@pytest.fixture
def index_pair(tmp_path, rng):
    fa = tmp_path / "in.fa"
    fa.write_text(random_fasta(rng, n_records=6, min_len=150, max_len=900,
                               n_prob=0.01))
    fq = tmp_path / "in.fq"
    fq.write_text(random_fastq(rng, 80, 70, n_prob=0.01))
    return tmp_path, ["in.fa", "in.fq"]


@pytest.mark.parametrize("w", [8, 16, 25])
def test_index_byte_identical(index_pair, w):
    tmp, inputs = index_pair
    r = run_reference(["glistmaker"] + inputs + ["-w", str(w), "-o", "ref",
                                                 "--index"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    import os
    from genometester4_tpu.cli.glistmaker import main
    old = os.getcwd()
    os.chdir(tmp)
    try:
        rc, _ = run_cli(main, inputs + ["-w", str(w), "-o", "tpu", "--index"])
    finally:
        os.chdir(old)
    assert rc == 0
    assert (tmp / f"tpu_{w}.index").read_bytes() == (
        tmp / f"ref_{w}.index").read_bytes()


def test_index_with_cutoff_byte_identical(index_pair):
    tmp, inputs = index_pair
    args = inputs + ["-w", "8", "-c", "2", "--max", "30", "--index"]
    r = run_reference(["glistmaker"] + args + ["-o", "ref"], cwd=tmp)
    assert r.returncode == 0, r.stderr
    import os
    from genometester4_tpu.cli.glistmaker import main
    old = os.getcwd()
    os.chdir(tmp)
    try:
        rc, _ = run_cli(main, args + ["-o", "tpu"])
    finally:
        os.chdir(old)
    assert rc == 0
    assert (tmp / "tpu_8.index").read_bytes() == (
        tmp / "ref_8.index").read_bytes()


QUERY_ARGSETS = [
    ["--files"],
    ["--sequences"],
    ["--locations"],
    [],
    ["--stat"],
    ["--median"],
    ["-q", "ACGTACGT", "--locations"],
    ["-q", "ACGTACGT", "-mm", "1", "--locations"],
    ["-q", "TTTTACGT"],
]


def test_glistquery_index_features(index_pair):
    tmp, inputs = index_pair
    r = run_reference(["glistmaker"] + inputs + ["-w", "8", "-o", "ref",
                                                 "--index"], cwd=tmp)
    assert r.returncode == 0
    import os
    from genometester4_tpu.cli.glistquery import main
    for extra in QUERY_ARGSETS:
        ref = run_reference(["glistquery", "ref_8.index"] + extra, cwd=tmp)
        assert ref.returncode == 0, (extra, ref.stderr)
        old = os.getcwd()
        os.chdir(tmp)
        try:
            rc, out = run_cli(main, ["ref_8.index"] + extra)
        finally:
            os.chdir(old)
        assert rc == 0, extra
        assert out == ref.stdout.decode(), extra


def test_glistcompare_index_inputs(index_pair):
    tmp, inputs = index_pair
    for i, f in enumerate(inputs):
        r = run_reference(["glistmaker", f, "-w", "8", "-o", f"r{i}",
                           "--index"], cwd=tmp)
        assert r.returncode == 0
    ref = run_reference(["glistcompare", "r0_8.index", "r1_8.index", "-u",
                         "-i", "-d", "-o", "refc"], cwd=tmp)
    assert ref.returncode == 0, ref.stderr
    import os
    from genometester4_tpu.cli.glistcompare import main
    old = os.getcwd()
    os.chdir(tmp)
    try:
        rc, _ = run_cli(main, ["r0_8.index", "r1_8.index", "-u", "-i", "-d",
                               "-o", "tpuc"])
    finally:
        os.chdir(old)
    assert rc == 0
    for suffix in ("_8_union.list", "_8_intrsec.list", "_8_0_diff1.list"):
        assert (tmp / f"tpuc{suffix}").read_bytes() == (
            tmp / f"refc{suffix}").read_bytes(), suffix


def test_kmer_predictor_self_consistency(tmp_path, rng):
    """No differential oracle (the reference program is bit-rotted and
    does not compile); check the model recovers a planted linear signal
    and the coefficients file has the documented shape."""
    from genometester4_tpu.cli.kmer_predictor import main as kp_main
    from genometester4_tpu.cli.glistmaker import main as lm_main
    import os
    B = "ACGT"
    base = "".join(B[i] for i in rng.integers(0, 4, 3000))
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        (tmp_path / "panel.fa").write_text(">p\n" + base[:800] + "\n")
        assert lm_main(["panel.fa", "-w", "10", "-o", "panel"]) == 0
        lines = []
        traits = []
        for s in range(30):
            frac = float(rng.random())
            seq = base[:int(200 + 600 * frac)] + "".join(
                B[i] for i in rng.integers(0, 4, 300))
            (tmp_path / f"s{s}.fa").write_text(f">s{s}\n{seq}\n")
            assert lm_main([f"s{s}.fa", "-w", "10", "-o", f"s{s}"]) == 0
            t = 10 + 20 * frac
            traits.append(t)
            lines.append(f"sample{s}\ts{s}_10.list\t{t:.2f}")
        (tmp_path / "lists.txt").write_text("\n".join(lines) + "\n")
        import io, sys
        err = io.StringIO()
        old_err = sys.stderr
        sys.stderr = err
        try:
            rc = kp_main(["--kmers", "panel_10.list", "--lists", "lists.txt",
                          "--write_coefficients", "coef.txt"])
        finally:
            sys.stderr = old_err
        assert rc == 0
        rows = [ln.split("\t") for ln in err.getvalue().strip().split("\n")]
        assert len(rows) == 30
        true = np.array([float(r[1]) for r in rows])
        pred = np.array([float(r[2]) for r in rows])
        assert np.corrcoef(true, pred)[0, 1] > 0.9
        coef = (tmp_path / "coef.txt").read_text().splitlines()
        assert coef[0].startswith("AVG_FF\t")
        assert coef[1].startswith("SCALE\t")
    finally:
        os.chdir(old)


def test_header_only_index_zero_words(tmp_path):
    """Inputs shorter than k produce the reference's header-only .index
    (write_index_header path, fuzz finding)."""
    fq = tmp_path / "tiny.fq"
    fq.write_text("@r0\nACGT\n+\nIIII\n")
    r = run_reference(["glistmaker", "tiny.fq", "-w", "21", "--index",
                       "-o", "ref"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    import os
    from genometester4_tpu.cli.glistmaker import main
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc, _ = run_cli(main, ["tiny.fq", "-w", "21", "--index", "-o",
                               "tpu"])
    finally:
        os.chdir(old)
    assert rc == 0
    assert (tmp_path / "tpu_21.index").read_bytes() == (
        tmp_path / "ref_21.index").read_bytes()
    from genometester4_tpu.formats.index_format import read_index_map
    im = read_index_map(tmp_path / "tpu_21.index")
    assert len(im.words) == 0 and len(im.files) == 0


def test_make_index_streaming_slabs_byte_identical(rng, tmp_path):
    """glistmaker --index in O(slab) ingestion: tiny slabs (records
    spanning many seams) must produce the same .index bytes as the
    one-slab path and the reference (round-1 VERDICT missing #5)."""
    from tests.conftest import random_fasta, run_reference
    from genometester4_tpu.pipelines.listmaker import make_index

    text = random_fasta(rng, n_records=5, min_len=800, max_len=4000,
                        n_prob=0.02)
    fa = tmp_path / "in.fa"
    fa.write_text(text)
    r = run_reference(["glistmaker", str(fa), "-w", "12", "--index",
                       "-o", str(tmp_path / "ref")])
    assert r.returncode == 0, r.stderr
    make_index([str(fa)], 12, str(tmp_path / "tiny.index"),
               slab_bytes=1 << 10)
    make_index([str(fa)], 12, str(tmp_path / "big.index"))
    ref = (tmp_path / "ref_12.index").read_bytes()
    assert (tmp_path / "big.index").read_bytes() == ref
    assert (tmp_path / "tiny.index").read_bytes() == ref


def test_make_index_gz_records_compressed_size(rng, tmp_path):
    """Fuzz regression (round 2): the registry's file-size field is the
    ON-DISK size — for .gz inputs the COMPRESSED size — while subseq
    offsets stay decompressed-stream coordinates (the reference stats
    the file but parses through its zstream)."""
    import gzip

    from tests.conftest import random_fasta, run_reference
    from genometester4_tpu.pipelines.listmaker import make_index

    text = random_fasta(rng, 3, 1000, 4000, n_prob=0.02)
    fa = tmp_path / "in.fa"
    fa.write_text(text)
    gz = tmp_path / "in.fa.gz"
    gz.write_bytes(gzip.compress(text.encode()))
    r = run_reference(["glistmaker", str(gz), "-w", "11", "--index",
                       "-o", str(tmp_path / "ref")])
    assert r.returncode == 0, r.stderr
    make_index([str(gz)], 11, str(tmp_path / "t.index"))
    assert (tmp_path / "t.index").read_bytes() == (
        tmp_path / "ref_11.index").read_bytes()


def test_corrupt_index_chrome_parity(rng, tmp_path):
    """fuzz_index_chrome findings (round 4): the reference validates
    ONLY the magic and major version at index open (gt4_index_map_new,
    src/index-map.c:322-351) and touches every other region lazily —
    so (a) a non-4 major version must print the reference's diagnostic
    + corrupted line, (b) a flipped minor version must flow into the
    --stat chrome verbatim, and (c) a file truncated to cut only the
    locations block must still dump words/counts."""
    import struct
    import subprocess

    from tests.conftest import has_reference, run_reference
    if not has_reference():
        import pytest
        pytest.skip("reference not built")
    fa = tmp_path / "in.fa"
    fa.write_text(random_fasta(rng, 2, 2000, 4000))
    r = run_reference(["glistmaker", str(fa), "-w", "12", "--index",
                       "-o", str(tmp_path / "ix")])
    assert r.returncode == 0, r.stderr
    base = (tmp_path / "ix_12.index").read_bytes()
    BIN = str(Path(__file__).resolve().parent.parent / "bin" / "glistquery")

    def both(data, cmd):
        bad = tmp_path / "bad.index"
        bad.write_bytes(data)
        ro = subprocess.run([BIN, str(bad)] + cmd, capture_output=True)
        rr = run_reference(["glistquery", str(bad)] + cmd)
        assert rr.returncode >= 0, "reference crashed: not an oracle"
        assert ro.returncode == rr.returncode, (cmd, ro.stderr, rr.stderr)
        assert ro.stdout == rr.stdout, cmd
        assert ro.stderr == rr.stderr, cmd

    # (a) major version 5: open fails with the reference diagnostic
    b = bytearray(base)
    struct.pack_into("<I", b, 4, 5)
    for cmd in (["--stat"], ["--median"], []):
        both(bytes(b), cmd)
    # (b) minor version 7: accepted; --stat prints "4.7"
    b = bytearray(base)
    struct.pack_into("<I", b, 8, 7)
    both(bytes(b), ["--stat"])
    # (c) truncate to the start of the locations block: dump + --stat +
    # --sequences still answer (locations untouched)
    (_c, _vj, _vn, _wl, _nw, _nl, _fb, _sb, _pb, _f, _fs, _ks,
     ls) = struct.unpack_from("<IIIIQQIIIIQQQ", base, 0)
    for cmd in ([], ["--stat"], ["--sequences"]):
        both(base[:ls], cmd)
