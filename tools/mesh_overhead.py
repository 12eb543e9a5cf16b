"""Measure the SPMD mesh program's overhead vs the direct device path
at dp=1, kp=1 on the real chip (round-3 VERDICT missing #4).

The mesh is the default device count path whenever >1 device is
visible; this quantifies what the SPMD formulation itself costs — the
merge-side dedupe over the compacted column buffer plus the routing
copies and degenerate collectives — so BASELINE.md's "Multi-chip
(projected)" table can derive expected N-chip throughput from measured
single-chip numbers instead of hand-waving. History on this container:
9.15 s round 3 (serialized bucketing gather + 3x-slack merge), 2.42 s
after the contiguous-slice routing fix, 0.896 s after the hard bucket/
merge bounds (8.2x the 0.109 s direct pipeline) — see BASELINE.md
"Mesh overhead" for the anatomy.

Run under `timeout` from the repo root (the axon tunnel can hang inside
XLA): `timeout 420 python tools/mesh_overhead.py`.

Prints one JSON line:
  direct_dt      fused extract->sort->marks pipeline (bench.py kernel)
  spmd_dt        sharded_count_step on a (1,1) mesh, same input
  spmd_cap1_dt   same with cap_factor=1 (isolates the 3x-slack cost)
  local_dt       extract + local count_unique only (the part every mesh
                 device runs before any collective)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 25
CHUNK = 1 << 25


def timed(fn, *args, reps=3, sync=lambda r: None, label=""):
    t0 = time.time()
    sync(fn(*args))  # compile
    print(f"[mesh_overhead] {label}: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from genometester4_tpu.ops.kmers import extract_kmers, extract_kmers_best
    from genometester4_tpu.ops.sortcount import count_unique
    from genometester4_tpu.parallel.sharding import (make_mesh,
                                                     sharded_count_step)

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=CHUNK, dtype=np.int64).astype(np.uint8)
    n_windows = CHUNK - K + 1
    HB = 2 * K - 32

    # direct path: the bench.py device kernel (sort + Pallas run marks)
    @jax.jit
    def direct(c):
        hi, lo, valid = extract_kmers_best(c, K, canonical=True)
        packed = jnp.where(valid, jnp.uint32(0), jnp.uint32(1 << HB)) | hi
        sp, sl = jax.lax.sort((packed, lo), num_keys=2, is_stable=False)
        from genometester4_tpu.ops.runmarks_pallas import make_run_marks
        _, _, n, total, checksum = make_run_marks(
            sp.shape[0], HB, write_masks=False)(sp, sl)
        return n, total, checksum

    # the pre-collective part of the mesh step
    @jax.jit
    def local(c):
        hi, lo, valid = extract_kmers(c, K, canonical=True)
        ones = jnp.ones(hi.shape, jnp.uint32)
        uhi, ulo, ucnt, n = count_unique(hi, lo, ones, valid,
                                         hi_bits=HB, unit_weights=True)
        return n

    dc = jax.device_put(codes)
    out = {}
    out["n_windows"] = n_windows
    out["direct_dt"] = timed(direct, dc, sync=lambda r: int(r[0]), label="direct")
    out["local_dt"] = timed(local, dc, sync=lambda r: int(r), label="local")

    mesh = make_mesh(1)
    blocks = dc.reshape(1, 1, CHUNK)
    fn, _ = sharded_count_step(mesh, K, CHUNK)
    out["spmd_dt"] = timed(fn, blocks, sync=lambda r: int(r[3][0]),
                           label="spmd_dt")
    # the default slack must hold at kp=1 (all words in bucket 0)
    assert not int(np.asarray(fn(blocks)[4]))

    out["spmd_overhead_x"] = round(out["spmd_dt"] / out["direct_dt"], 3)
    out["kmers_per_s_direct"] = round(n_windows / out["direct_dt"], 1)
    out["kmers_per_s_spmd"] = round(n_windows / out["spmd_dt"], 1)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
