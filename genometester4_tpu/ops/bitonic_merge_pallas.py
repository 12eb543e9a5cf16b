"""Pallas TPU kernel: pairwise bitonic merge of sorted (k1, k2) rows.

Round-3 VERDICT next #5 — the timeboxed attempt at beating lax.sort,
which is ~60% of the device count pipeline. The hypothesis under test
(tools/sort_experiment.py): batched short-row sorts are measurably
cheaper per element than one full sort (BASELINE.md: ~2.4x at 32K
rows), so short-row sort + log2(n/L0) pairwise merge rounds could beat
the monolithic sort IF a merge round is cheap enough. A merge of two
sorted length-L runs is ONE bitonic merge network — log2(2L)
compare-exchange stages — not a full bitonic sort (log^2 stages): run A
ascending concatenated with run B reversed is a bitonic sequence.

Each grid step loads one row pair (both runs entirely in VMEM — valid
for L up to ~128K at 16 MB VMEM; larger rounds would need the
big-distance stages hoisted to XLA elementwise passes, see
sort_experiment results in BASELINE.md), runs the stages, and writes
the merged 2L row.

Every compare-exchange stage is expressed with `pltpu.roll` instead of
reshapes: the distance-d partner of element i is i^d, which is i+d for
the lo element of each pair and i-d for the hi element, so two
circular rolls (+d and -d along the row or lane axis) plus a parity
mask select the partner without any relayout. Mosaic rejects the
reshape formulation ("infer-vector-layout: unsupported shape cast" on
lane-axis regrouping, measured on v5e); rolls are native shuffles.
Wrapped values at the roll seams are never selected (if bit d of i is
0 then i+d stays in range, else i-d does).

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
def make_block_merge(n_blocks: int, span: int, start_d: int | None = None,
                     interpret: bool = False):
    """Bitonic-merge each length-``span`` block of the input.

    Inputs k1, k2: int32[(n_blocks*span)//LANE, LANE] row-major (block
    b occupies array rows [b*span/LANE, (b+1)*span/LANE)). Every block
    must already be a BITONIC sequence (e.g. an ascending run followed
    by a descending run, or any rotation thereof — the caller reverses
    odd runs, merge_round below). Runs compare-exchange stages at
    distances start_d, start_d/2, …, 1 (start_d defaults to span/2,
    the full merge network) and writes each block fully sorted
    ascending.

    ``start_d`` < span/2 supports the hybrid-sort deep rounds where
    the larger distances were already applied as XLA elementwise
    passes and each span-sized block is bitonic by construction.
    """
    assert span % (2 * LANE) == 0 and (span & (span - 1)) == 0, \
        "span must be pow2 multiple of 2*LANE"
    block_rows = span // LANE
    if start_d is None:
        start_d = span // 2
    assert (start_d & (start_d - 1)) == 0 and start_d < span

    def kernel(k1_ref, k2_ref, o1_ref, o2_ref):
        x1 = k1_ref[...] ^ jnp.int32(_BIAS)
        x2 = k2_ref[...] ^ jnp.int32(_BIAS)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, LANE), 0)
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, LANE), 1)
        d = start_d
        while d >= 1:
            if d >= LANE:
                dr = d // LANE
                axis, shift_n, iota, dd = 0, block_rows, row_iota, dr
            else:
                axis, shift_n, iota, dd = 1, LANE, lane_iota, d
            f1 = pltpu.roll(x1, shift=shift_n - dd, axis=axis)
            f2 = pltpu.roll(x2, shift=shift_n - dd, axis=axis)
            b1 = pltpu.roll(x1, shift=dd, axis=axis)
            b2 = pltpu.roll(x2, shift=dd, axis=axis)
            # int32 bit-selects only: Mosaic rejects reused i1 masks
            # feeding multiple select_n ops ("Unsupported target
            # bitwidth for truncation", v5e) — the same quirk
            # runmarks_pallas.py works around with its int32-only rule
            lo1 = ((iota & dd) == 0).astype(jnp.int32)   # 1 at lo slots
            neg_lo = -lo1                                 # -1 at lo slots
            p1 = b1 ^ ((b1 ^ f1) & neg_lo)
            p2 = b2 ^ ((b2 ^ f2) & neg_lo)
            gt = ((x1 > p1) | ((x1 == p1) & (x2 > p2))).astype(jnp.int32)
            lt = ((p1 > x1) | ((p1 == x1) & (x2 < p2))).astype(jnp.int32)
            neg_take = -((gt & lo1) | (lt & (1 - lo1)))
            x1 = x1 ^ ((x1 ^ p1) & neg_take)
            x2 = x2 ^ ((x2 ^ p2) & neg_take)
            d //= 2
        o1_ref[...] = x1 ^ jnp.int32(_BIAS)
        o2_ref[...] = x2 ^ jnp.int32(_BIAS)

    total_rows = n_blocks * block_rows
    spec = pl.BlockSpec((block_rows, LANE), lambda p: (p, 0))
    fn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
        ],
        grid=(n_blocks,),
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
    fn = make_block_merge(n_pairs, 2 * L, interpret=interpret)
    i1 = jax.lax.bitcast_convert_type(r1.reshape(-1, LANE), jnp.int32)
    i2 = jax.lax.bitcast_convert_type(r2.reshape(-1, LANE), jnp.int32)
    o1, o2 = fn(i1, i2)
    u1 = jax.lax.bitcast_convert_type(o1, jnp.uint32).reshape(n)
    u2 = jax.lax.bitcast_convert_type(o2, jnp.uint32).reshape(n)
    return u1, u2
