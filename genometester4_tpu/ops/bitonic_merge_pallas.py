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
                     interpret: bool = False, n_payload: int = 0):
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

    ``n_payload`` extra int32 arrays ride along: they are moved by the
    same compare-exchange decisions but never compared (the mesh merge
    carries per-word counts this way, round-5 VERDICT #1).
    """
    assert span % (2 * LANE) == 0 and (span & (span - 1)) == 0, \
        "span must be pow2 multiple of 2*LANE"
    block_rows = span // LANE
    if start_d is None:
        start_d = span // 2
    assert (start_d & (start_d - 1)) == 0 and start_d < span

    def kernel(*refs):
        in_refs = refs[:2 + n_payload]
        out_refs = refs[2 + n_payload:]
        x1 = in_refs[0][...] ^ jnp.int32(_BIAS)
        x2 = in_refs[1][...] ^ jnp.int32(_BIAS)
        xv = [r[...] for r in in_refs[2:]]
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
            fv = [pltpu.roll(v, shift=shift_n - dd, axis=axis) for v in xv]
            bv = [pltpu.roll(v, shift=dd, axis=axis) for v in xv]
            # int32 bit-selects only: Mosaic rejects reused i1 masks
            # feeding multiple select_n ops ("Unsupported target
            # bitwidth for truncation", v5e) — the same quirk
            # runmarks_pallas.py works around with its int32-only rule
            lo1 = ((iota & dd) == 0).astype(jnp.int32)   # 1 at lo slots
            neg_lo = -lo1                                 # -1 at lo slots
            p1 = b1 ^ ((b1 ^ f1) & neg_lo)
            p2 = b2 ^ ((b2 ^ f2) & neg_lo)
            pv = [b ^ ((b ^ f) & neg_lo) for b, f in zip(bv, fv)]
            gt = ((x1 > p1) | ((x1 == p1) & (x2 > p2))).astype(jnp.int32)
            lt = ((p1 > x1) | ((p1 == x1) & (x2 < p2))).astype(jnp.int32)
            neg_take = -((gt & lo1) | (lt & (1 - lo1)))
            x1 = x1 ^ ((x1 ^ p1) & neg_take)
            x2 = x2 ^ ((x2 ^ p2) & neg_take)
            xv = [v ^ ((v ^ p) & neg_take) for v, p in zip(xv, pv)]
            d //= 2
        out_refs[0][...] = x1 ^ jnp.int32(_BIAS)
        out_refs[1][...] = x2 ^ jnp.int32(_BIAS)
        for r, v in zip(out_refs[2:], xv):
            r[...] = v

    total_rows = n_blocks * block_rows
    spec = pl.BlockSpec((block_rows, LANE), lambda p: (p, 0))
    n_arr = 2 + n_payload
    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32)
                   for _ in range(n_arr)],
        grid=(n_blocks,),
        in_specs=[spec] * n_arr,
        out_specs=[spec] * n_arr,
        interpret=interpret,
    )
    return fn


def _big_stage(arrs, d):
    """One distance-``d`` bitonic compare-exchange pass over the whole
    stream as XLA elementwise traffic (the t_stage component of the
    sort experiment, tools/sort_experiment.py): min/max of (k1,k2)
    lexicographic on uint32, payloads moved by the same decision."""
    jnp_ = jnp
    r1 = arrs[0].reshape(-1, 2, d)
    r2 = arrs[1].reshape(-1, 2, d)
    a1, b1 = r1[:, 0], r1[:, 1]
    a2, b2 = r2[:, 0], r2[:, 1]
    swap = (a1 > b1) | ((a1 == b1) & (a2 > b2))
    out = []
    for a in arrs:
        r = a.reshape(-1, 2, d)
        lo = jnp_.where(swap, r[:, 1], r[:, 0])
        hi = jnp_.where(swap, r[:, 0], r[:, 1])
        out.append(jnp_.stack([lo, hi], 1).reshape(-1))
    return out


def merge_sorted_runs(arrays, L: int, span_log: int = 17,
                      use_pallas: bool = True, interpret: bool = False):
    """One merge round at arbitrary run length with payloads.

    ``arrays`` = (k1, k2, *payloads): uint32[n] flat streams where every
    aligned length-``L`` span is sorted ascending by the (k1, k2)
    unsigned lexicographic key; n must be a multiple of 2L. Returns the
    same tuple with every 2L span sorted, payloads moved alongside.

    Schedule (the hybrid the sort experiment measured at 12 ms/round
    for 2 arrays at 2^25): reverse odd runs (each 2L block becomes
    bitonic), run compare-exchange distances L … span as full-array
    XLA elementwise passes, then finish distances span/2 … 1 with the
    in-VMEM Pallas kernel (span = min(2L, 2^span_log)). With
    ``use_pallas=False`` (CPU meshes, virtual-device tests) every
    distance runs as an XLA pass — bit-identical output, no Mosaic.
    """
    k1 = arrays[0]
    n = k1.shape[0]
    assert n % (2 * L) == 0, (n, L)
    n_pairs = n // (2 * L)

    def rev_odd(a):
        r = a.reshape(n_pairs, 2, L)
        return r.at[:, 1].set(r[:, 1, ::-1]).reshape(n)

    arrs = [rev_odd(a) for a in arrays]
    span = min(2 * L, 1 << span_log)
    if use_pallas and span % (2 * LANE) != 0:
        use_pallas = False      # tiny runs: pure-XLA stages
    d = L
    while d >= (span if use_pallas else 1):
        arrs = _big_stage(arrs, d)
        d //= 2
    if not use_pallas:
        return tuple(arrs)
    fn = make_block_merge(n // span, span, start_d=span // 2,
                          interpret=interpret,
                          n_payload=len(arrs) - 2)
    ints = [jax.lax.bitcast_convert_type(a.reshape(-1, LANE), jnp.int32)
            for a in arrs]
    outs = fn(*ints)
    return tuple(jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(n)
                 for o in outs)


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
