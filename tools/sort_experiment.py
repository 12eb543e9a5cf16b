"""The timeboxed lax.sort-beating experiment (round-3 VERDICT next #5).

Hypothesis: the 2-key sort (~60% of the device count pipeline) can be
beaten by short-row batched sorts + a log-depth schedule of bitonic
MERGE rounds, because (a) batched row sorts measure cheaper per element
than one monolithic sort (BASELINE.md: ~2.4x at 32K rows) and (b) a
merge round is only log2(2L) compare-exchange stages.

A full hybrid sort needs, per round k -> k+1 above the VMEM block size:
(k+1-log2(span)) full-array "big-distance" compare-exchange passes
(each is pure elementwise traffic) plus one in-VMEM small-distance
kernel (ops/bitonic_merge_pallas.py). This script measures every
component on the real chip and prints the extrapolated hybrid total vs
lax.sort:

  t_null        dispatch+scalar-readback floor over the axon tunnel
  t_full        lax.sort((k1,k2), num_keys=2) at n=2^25
  t_rows[L]     batched per-row sort at row length L
  t_stage       one big-distance compare-exchange pass at n (XLA
                elementwise — the irreducible per-stage traffic cost)
  t_round[L]    one full Pallas merge round at run length L
  hybrid_est    t_rows[L0] + sum over rounds of measured costs

All timings force execution with a SCALAR readback: under the axon
tunnel block_until_ready returns immediately (lazy AOT execution), so
any harness that "syncs" with it measures dispatch, not compute
(measured: t_full "0.0 ms"). Big-array readback is equally forbidden
(~0.4 MB/s tunnel). Small quantities are chained N times inside one
jit and divided, so the ~25 ms round-trip floor cannot swamp them;
t_null is subtracted from everything.

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


def timed(fn, *args, reps=3, t_null=0.0, chain=1):
    """Best-of-reps wall time of fn; fn MUST return scalars (or tiny
    arrays) so the int() readback forces execution."""
    def sync(r):
        leaf = jax_leaves(r)[0]
        return float(np.asarray(leaf))
    sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return max(0.0, best - t_null) / chain


def jax_leaves(r):
    import jax
    return [x for x in jax.tree_util.tree_leaves(r)]


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
    def null_probe(a):
        return a[0] + a[-1]

    out["t_null"] = timed(null_probe, d1)
    t_null = out["t_null"]
    print(f"[sort_exp] t_null {t_null*1e3:.1f} ms",
          file=sys.stderr, flush=True)

    @jax.jit
    def full_sort(a, b):
        s1, s2 = jax.lax.sort((a, b), num_keys=2, is_stable=False)
        return s1[0], s1[-1], s2[0], s2[-1]

    out["t_full"] = timed(full_sort, d1, d2, t_null=t_null)
    print(f"[sort_exp] t_full {out['t_full']*1e3:.1f} ms",
          file=sys.stderr, flush=True)

    def make_row_sort(L):
        @jax.jit
        def row_sort(a, b):
            s1, s2 = jax.lax.sort((a.reshape(-1, L), b.reshape(-1, L)),
                                  num_keys=2, is_stable=False, dimension=1)
            return s1[0, 0], s1[-1, -1], s2[0, 0]
        return row_sort

    out["t_rows"] = {}
    for L in (1 << 13, 1 << 15, 1 << 17):
        out["t_rows"][str(L)] = timed(make_row_sort(L), d1, d2,
                                      t_null=t_null)
        print(f"[sort_exp] t_rows[{L}] {out['t_rows'][str(L)]*1e3:.1f} ms",
              file=sys.stderr, flush=True)

    # one big-distance compare-exchange pass (XLA elementwise): the
    # irreducible cost of every stage with d >= the VMEM block size.
    # Chained x8 inside the jit to amortize the dispatch floor.
    def one_stage(a, b):
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

    STAGE_CHAIN = 8

    @jax.jit
    def stage_x8(a, b):
        for _ in range(STAGE_CHAIN):
            a, b = one_stage(a, b)
        return a[0] + a[-1], b[0]

    out["t_stage"] = timed(stage_x8, d1, d2, t_null=t_null,
                           chain=STAGE_CHAIN)
    print(f"[sort_exp] t_stage {out['t_stage']*1e3:.2f} ms",
          file=sys.stderr, flush=True)

    # Pallas in-VMEM merge rounds (whole array, runs of length L),
    # chained x4 (output L-runs are still sorted, so re-merging at the
    # same L is a valid same-cost program)
    from genometester4_tpu.ops.bitonic_merge_pallas import merge_round
    interpret = jax.default_backend() != "tpu"
    ROUND_CHAIN = 4
    out["t_round"] = {}
    for L in (1 << 13, 1 << 15, 1 << 16):
        if interpret and N > (1 << 20):
            break  # interpret mode at 33M is pointlessly slow

        @jax.jit
        def round_x4(a, b, L=L):
            for _ in range(ROUND_CHAIN):
                a, b = merge_round(a, b, L, interpret=interpret)
            return a[0] + a[-1], b[0]

        out["t_round"][str(L)] = timed(round_x4, d1, d2, t_null=t_null,
                                       chain=ROUND_CHAIN)
        print(f"[sort_exp] t_round[{L}] {out['t_round'][str(L)]*1e3:.1f} ms",
              file=sys.stderr, flush=True)

    # correctness spot-check of one round ON DEVICE (a bulk readback
    # would take minutes over the tunnel): merge_round over sorted
    # L-runs must equal the direct 2L row sort
    L = 1 << 13

    @jax.jit
    def check(a, b):
        s1, s2 = jax.lax.sort((a.reshape(-1, L), b.reshape(-1, L)),
                              num_keys=2, is_stable=False, dimension=1)
        m1, m2 = merge_round(s1.reshape(-1), s2.reshape(-1), L,
                             interpret=interpret)
        f1, f2 = jax.lax.sort(
            (s1.reshape(-1, 2 * L), s2.reshape(-1, 2 * L)),
            num_keys=2, is_stable=False, dimension=1)
        ok = (jnp.all(m1 == f1.reshape(-1)) & jnp.all(m2 == f2.reshape(-1)))
        return ok.astype(jnp.int32)

    out["round_correct"] = bool(int(np.asarray(check(d1, d2))))
    print(f"[sort_exp] round_correct {out['round_correct']}",
          file=sys.stderr, flush=True)

    # extrapolation: start at the best row length, merge up to 2^25.
    # rounds whose 2L span fits the kernel use the measured Pallas
    # round cost; rounds above need (k+1-log2(span)) big stages + one
    # small-distance kernel pass (cost ~= the largest measured round)
    best_L0 = min(out["t_rows"], key=lambda k: out["t_rows"][k])
    t0 = out["t_rows"][best_L0]
    est = t0
    k0 = int(math.log2(int(best_L0)))
    span_log = 17  # kernel span 2^17 elems = 1 MB/array in VMEM
    t_small = out["t_round"].get(str(1 << 16),
                                 out["t_round"].get(str(1 << 15), 0.0))
    for k in range(k0, 25):
        big = max(0, (k + 1) - span_log)
        if (k + 1) <= span_log - 1:
            tr = out["t_round"].get(str(1 << k), t_small)
            est += tr
        else:
            est += big * out["t_stage"] + t_small
    out["hybrid_est"] = est
    out["speedup_est"] = out["t_full"] / est if est else None
    print(json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
