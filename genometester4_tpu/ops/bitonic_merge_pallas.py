"""Pallas TPU kernel: pairwise bitonic merge of sorted (k1, k2) rows.

Round-3 VERDICT next #5 — the timeboxed attempt at beating lax.sort,
which is ~60% of the device count pipeline. The hypothesis under test
(tools/sort_experiment.py): batched short-row sorts are measurably
cheaper per element than one full sort (BASELINE.md: ~2.4x at 32K
rows), so short-row sort + log2(n/L0) pairwise merge rounds could beat
the monolithic sort IF a merge round is cheap enough. A merge of two
sorted length-L runs is ONE bitonic merge network — log2(2L) + 1
compare-exchange stages — not a full bitonic sort (log^2 stages): run A
ascending concatenated with run B reversed is a bitonic sequence.

Each grid step loads one row pair (both runs entirely in VMEM — valid
for L up to ~128K at 16 MB VMEM; larger rounds would need merge-path
tiling with misaligned HBM DMA, which is exactly where this design
stops paying, see sort_experiment results in BASELINE.md), runs the
stages as static reshape + compare + select chains, and writes the
merged 2L row.

Unsigned 2-key compare — (k1a,k2a) < (k1b,k2b) lexicographic on u32
pairs — runs in int32 with the sign-flip bias applied at load and
removed at store (Mosaic vector compares are signed; same trick as
runmarks_pallas' int32-only rule).
"""

from __future__ import annotations

import functools

from genometester4_tpu.utils.lazyjax import jax, jnp
from genometester4_tpu.utils.lazyjax import pallas as pl, pallas_tpu as pltpu

LANE = 128
_BIAS = -(1 << 31)  # int32 sign-flip bias (x ^ BIAS orders u32 as i32)


@functools.lru_cache(maxsize=None)
def make_pair_merge(n_pairs: int, L: int, interpret: bool = False):
    """Merge rows (2p, 2p+1), each a sorted length-L run, for p in
    [0, n_pairs). Inputs k1, k2: int32[(2*n_pairs*L)//LANE, LANE]
    row-major (row r occupies array rows [r*L/LANE, (r+1)*L/LANE)).
    ODD rows must be PRE-REVERSED by the caller (descending), so each
    block is already one bitonic sequence. Returns (k1', k2') of the
    same shape where each 2L span is fully sorted ascending.
    """
    assert L % LANE == 0 and (L & (L - 1)) == 0, "L must be pow2*128"
    rows_per_run = L // LANE
    block_rows = 2 * rows_per_run          # one pair per grid step
    n2 = 2 * L                              # merged span length
    stages = n2.bit_length() - 1            # log2(2L)

    def kernel(k1_ref, k2_ref, o1_ref, o2_ref):
        x1 = k1_ref[...] ^ jnp.int32(_BIAS)
        x2 = k2_ref[...] ^ jnp.int32(_BIAS)
        for j in range(stages - 1, -1, -1):
            d = 1 << j
            if d >= LANE:
                dr = d // LANE
                s1 = x1.reshape(n2 // (2 * d), 2, dr, LANE)
                s2 = x2.reshape(n2 // (2 * d), 2, dr, LANE)
                a1, b1 = s1[:, 0], s1[:, 1]
                a2, b2 = s2[:, 0], s2[:, 1]
                swap = (a1 > b1) | ((a1 == b1) & (a2 > b2))
                lo1 = jnp.where(swap, b1, a1)
                hi1 = jnp.where(swap, a1, b1)
                lo2 = jnp.where(swap, b2, a2)
                hi2 = jnp.where(swap, a2, b2)
                x1 = jnp.stack([lo1, hi1], axis=1).reshape(
                    block_rows, LANE)
                x2 = jnp.stack([lo2, hi2], axis=1).reshape(
                    block_rows, LANE)
            else:
                # lane-dimension exchange: reshape the lane axis
                s1 = x1.reshape(block_rows, LANE // (2 * d), 2, d)
                s2 = x2.reshape(block_rows, LANE // (2 * d), 2, d)
                a1, b1 = s1[:, :, 0], s1[:, :, 1]
                a2, b2 = s2[:, :, 0], s2[:, :, 1]
                swap = (a1 > b1) | ((a1 == b1) & (a2 > b2))
                lo1 = jnp.where(swap, b1, a1)
                hi1 = jnp.where(swap, a1, b1)
                lo2 = jnp.where(swap, b2, a2)
                hi2 = jnp.where(swap, a2, b2)
                x1 = jnp.stack([lo1, hi1], axis=2).reshape(
                    block_rows, LANE)
                x2 = jnp.stack([lo2, hi2], axis=2).reshape(
                    block_rows, LANE)
        o1_ref[...] = x1 ^ jnp.int32(_BIAS)
        o2_ref[...] = x2 ^ jnp.int32(_BIAS)

    total_rows = n_pairs * block_rows
    spec = pl.BlockSpec((block_rows, LANE), lambda p: (p, 0))
    fn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
        ],
        grid=(n_pairs,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        interpret=interpret,
    )
    return fn


def merge_round(k1, k2, L: int, interpret: bool = False):
    """One merge round over a flat sorted-runs stream.

    k1, k2: uint32[n] where every aligned length-L span is sorted and n
    is a multiple of 2L. Returns (k1', k2') with every 2L span sorted.
    """
    n = k1.shape[0]
    assert n % (2 * L) == 0
    n_pairs = n // (2 * L)
    # reverse odd runs so each pair forms a bitonic sequence (cheap
    # elementwise relayout in XLA, fused with the bitcasts)
    r1 = k1.reshape(n_pairs, 2, L)
    r2 = k2.reshape(n_pairs, 2, L)
    r1 = r1.at[:, 1].set(r1[:, 1, ::-1])
    r2 = r2.at[:, 1].set(r2[:, 1, ::-1])
    fn = make_pair_merge(n_pairs, L, interpret=interpret)
    i1 = jax.lax.bitcast_convert_type(r1.reshape(-1, LANE), jnp.int32)
    i2 = jax.lax.bitcast_convert_type(r2.reshape(-1, LANE), jnp.int32)
    o1, o2 = fn(i1, i2)
    u1 = jax.lax.bitcast_convert_type(o1, jnp.uint32).reshape(n)
    u2 = jax.lax.bitcast_convert_type(o2, jnp.uint32).reshape(n)
    return u1, u2
