"""The timeboxed lax.sort-beating experiment (round-3 VERDICT next #5).

Hypothesis: the 2-key sort (~60% of the device count pipeline) can be
beaten by short-row batched sorts + a log-depth schedule of bitonic
MERGE stages, because (a) batched row sorts measure cheaper per element
than one monolithic sort (BASELINE.md: ~2.4x at 32K rows) and (b) a
merge round is only log2(2L)+1 compare-exchange stages.

A full hybrid sort needs, per round k -> k+1 above the VMEM block size:
(k+1-17) full-array "big-distance" compare-exchange passes (each is
pure elementwise traffic) plus one in-VMEM small-distance kernel
(ops/bitonic_merge_pallas.py). This script measures every component on
the real chip and prints the extrapolated hybrid total vs lax.sort:

  t_full        lax.sort((k1,k2), num_keys=2) at n=2^25
  t_rows[L]     batched per-row sort at row length L
  t_stage       one big-distance compare-exchange pass at n (XLA
                elementwise — the irreducible per-stage traffic cost)
  t_round[L]    one full Pallas merge round at run length L
  hybrid_est    t_rows[L0] + sum over rounds of measured costs

Decision rule (VERDICT): >1.3x speedup -> build it into the pipeline;
else record the counter-result in BASELINE.md with these numbers.

Run: timeout 900 python tools/sort_experiment.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 25
HI_BITS = 19   # bench packed key: 18 significant bits + invalid flag


def timed(fn, *args, reps=3):
    r = fn(*args)
    jax_block(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax_block(fn(*args))
        best = min(best, time.time() - t0)
    return best


def jax_block(r):
    import jax
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, r)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    k1 = rng.integers(0, 1 << HI_BITS, N).astype(np.uint32)
    k2 = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    d1 = jax.device_put(k1)
    d2 = jax.device_put(k2)
    out = {"n": N, "backend": jax.default_backend()}

    @jax.jit
    def full_sort(a, b):
        return jax.lax.sort((a, b), num_keys=2, is_stable=False)

    out["t_full"] = timed(full_sort, d1, d2)
    print(f"[sort_exp] t_full {out['t_full']*1e3:.1f} ms",
          file=sys.stderr, flush=True)

    def make_row_sort(L):
        @jax.jit
        def row_sort(a, b):
            return jax.lax.sort((a.reshape(-1, L), b.reshape(-1, L)),
                                num_keys=2, is_stable=False, dimension=1)
        return row_sort

    out["t_rows"] = {}
    for L in (1 << 13, 1 << 15, 1 << 17):
        out["t_rows"][str(L)] = timed(make_row_sort(L), d1, d2)
        print(f"[sort_exp] t_rows[{L}] {out['t_rows'][str(L)]*1e3:.1f} ms",
              file=sys.stderr, flush=True)

    # one big-distance compare-exchange pass (XLA elementwise): the
    # irreducible cost of every stage with d >= the VMEM block size
    @jax.jit
    def big_stage(a, b):
        d = N // 4
        s1 = a.reshape(-1, 2, d)
        s2 = b.reshape(-1, 2, d)
        a1, b1 = s1[:, 0], s1[:, 1]
        a2, b2 = s2[:, 0], s2[:, 1]
        swap = (a1 > b1) | ((a1 == b1) & (a2 > b2))
        lo1 = jnp.where(swap, b1, a1)
        hi1 = jnp.where(swap, a1, b1)
        lo2 = jnp.where(swap, b2, a2)
        hi2 = jnp.where(swap, a2, b2)
        return (jnp.stack([lo1, hi1], 1).reshape(N),
                jnp.stack([lo2, hi2], 1).reshape(N))

    out["t_stage"] = timed(big_stage, d1, d2)
    print(f"[sort_exp] t_stage {out['t_stage']*1e3:.2f} ms",
          file=sys.stderr, flush=True)

    # Pallas in-VMEM merge rounds (whole array, runs of length L)
    from genometester4_tpu.ops.bitonic_merge_pallas import merge_round
    interpret = jax.default_backend() != "tpu"
    out["t_round"] = {}
    for L in (1 << 13, 1 << 15):
        if interpret and N > (1 << 20):
            break  # interpret mode at 33M is pointlessly slow
        fn = jax.jit(lambda a, b, L=L: merge_round(a, b, L,
                                                   interpret=interpret))
        out["t_round"][str(L)] = timed(fn, d1, d2)
        print(f"[sort_exp] t_round[{L}] {out['t_round'][str(L)]*1e3:.1f} ms",
              file=sys.stderr, flush=True)

    # correctness spot-check of one round on device
    L = 1 << 13
    s1, s2 = make_row_sort(L)(d1, d2)
    m1, m2 = jax.jit(lambda a, b: merge_round(a, b, L,
                                              interpret=interpret))(
        s1.reshape(-1), s2.reshape(-1))
    f1, f2 = make_row_sort(2 * L)(s1.reshape(-1), s2.reshape(-1))
    ok = (np.array_equal(np.asarray(m1), np.asarray(f1).reshape(-1))
          and np.array_equal(np.asarray(m2), np.asarray(f2).reshape(-1)))
    out["round_correct"] = bool(ok)

    # extrapolation: start at the best row length, merge up to 2^25.
    # rounds at run length <= 2^16 use the measured Pallas round cost;
    # rounds above need (k+1-17) big stages + one small-distance kernel
    # (>= one t_stage by traffic), so estimate each extra pass at
    # t_stage and the combined small-stage kernel at the 2^15 round cost
    best_L0 = min(out["t_rows"], key=lambda k: out["t_rows"][k])
    t0 = out["t_rows"][best_L0]
    est = t0
    k0 = int(math.log2(int(best_L0)))
    t_small = out["t_round"].get(str(1 << 15),
                                 out["t_round"].get(str(1 << 13), 0.0))
    for k in range(k0, 25):
        vmem_elems = 17
        big = max(0, (k + 1) - vmem_elems)
        est += big * out["t_stage"] + t_small
    out["hybrid_est"] = est
    out["speedup_est"] = out["t_full"] / est if est else None
    print(json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
