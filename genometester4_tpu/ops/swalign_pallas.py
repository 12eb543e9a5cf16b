"""Pallas TPU kernel: batched anti-diagonal Smith-Waterman.

One grid program per read; the whole DP state lives in VMEM scratch
(five diagonal vectors), each wavefront step is pure VPU work on a
(1, M_PAD) row, and the reference base needed along a diagonal comes
from a per-diagonal row of a precomputed (n_diag, M_PAD) base matrix —
the per-lane gather the naive formulation needs (`ref[d-j-1]`) is
restructured once outside the kernel (a 130 KB XLA gather), because
Mosaic only allows lane-dimension slices at 128-aligned offsets.

Integer-exact twin of ops.swalign.sw_matrices_batch (same recurrence,
tie-breaks, and int8 gap-length wrap — see that module for the
reference citations); output is diagonal-stacked like make_sw_jax and
converts with ops.swalign.diag_to_matrix.

Two kernels:

* make_sw_pallas — one read per grid program (1/8 sublane utilization;
  kept as the simplest formulation and a differential twin);
* make_sw_pallas_lanes — the production device kernel: 128 reads per
  group on LANES, read position on SUBLANES, one diagonal per grid
  step with DP state in persistent scratch. Full VPU tiles, per-lane
  (per-read) references so many gassembler regions batch into one
  launch. Measured on v5e at 128 reads x 200x150: ~5x the lax.scan
  twin per launch.
"""

from __future__ import annotations

import functools

from genometester4_tpu.utils.lazyjax import jax, jnp
import numpy as np
from genometester4_tpu.utils.lazyjax import pallas as pl, pallas_tpu as pltpu

from genometester4_tpu.ops.swalign import (GAP_EXT, GAP_OPEN, M_SCORE,
                                           MM_SCORE, N_SCORE, NEG, NUCL_N)

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_sw_pallas(n_cap: int, m_cap: int, interpret: bool = False):
    """Build the pallas SW for fixed (reference, read) capacities.

    Returns fn(ref int8[n_cap], reads int8[B, m_cap]) ->
    (score, sx, sy) int32[n+m-1, B, M_PAD] diagonal-stacked (row d-2
    holds cells with i+j == d); convert with diag_to_matrix using
    m = M_PAD - 1 column capacity semantics (see sw_pallas_matrices).
    """
    n, m = n_cap, m_cap
    m_pad = _round_up(m + 1, LANE)  # lanes j = 0..m (+ padding)
    n_diag = n + m - 1

    def kernel(adiag_ref, read_ref, score_out, sx_out, sy_out,
               sc2, sc1, lgs, lgl, tgs, tgl):
        # scratch rows are (1, m_pad) int32; index j = read position
        jlane = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
        b_n = read_ref[0, 0:1, :]  # (1, m_pad) int32, read base at j-1

        sc2[...] = jnp.zeros((1, m_pad), jnp.int32)
        sc1[...] = jnp.zeros((1, m_pad), jnp.int32)
        lgs[...] = jnp.full((1, m_pad), NEG, jnp.int32)
        lgl[...] = jnp.zeros((1, m_pad), jnp.int32)
        tgs[...] = jnp.full((1, m_pad), NEG, jnp.int32)
        tgl[...] = jnp.zeros((1, m_pad), jnp.int32)

        def step(d, _):
            valid = (jlane >= 1) & (jlane <= m) & (d - jlane >= 1) \
                & (d - jlane <= n)
            # reference base for cell (i, j) along this diagonal
            a_n = adiag_ref[pl.ds(d - 2, 1), :]
            sub = jnp.where((a_n >= NUCL_N) | (b_n >= NUCL_N),
                            jnp.int32(N_SCORE),
                            jnp.where(a_n == b_n, jnp.int32(M_SCORE),
                                      jnp.int32(MM_SCORE)))
            # diag (i-1, j-1): sc2 shifted right by one lane
            diag = sc2[0:1, :]
            diag_sh = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.int32), diag[:, :-1]], axis=1)
            dsc = diag_sh + sub
            take = dsc > 0
            cell = jnp.where(take, dsc, jnp.int32(0))
            csx = jnp.where(take, jnp.int32(-1), jnp.int32(0))
            csy = jnp.where(take, jnp.int32(-1), jnp.int32(0))
            # left gap from (i, j-1): previous-diag state shifted right
            prev_lgs = jnp.concatenate(
                [jnp.full((1, 1), NEG, jnp.int32), lgs[0:1, :-1]], axis=1)
            prev_lgl = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.int32), lgl[0:1, :-1]], axis=1)
            ls = cell + jnp.int32(GAP_OPEN)
            ll = jnp.zeros_like(ls)
            ext = (prev_lgs + jnp.int32(GAP_EXT)) > ls
            ls = jnp.where(ext, prev_lgs + jnp.int32(GAP_EXT), ls)
            # int8 wrap of the gap length, like the reference struct
            ll = jnp.where(ext, ((prev_lgl + 1 + 128) % 256) - 128, ll)
            sel = ls >= cell
            cell = jnp.where(sel, ls, cell)
            csx = jnp.where(sel, ((-ll + 128) % 256) - 128, csx)
            csy = jnp.where(sel, jnp.int32(0), csy)
            # top gap from (i-1, j): previous-diag state, same lane
            prev_tgs = tgs[0:1, :]
            prev_tgl = tgl[0:1, :]
            ts = cell + jnp.int32(GAP_OPEN)
            tl = jnp.zeros_like(ts)
            ext = (prev_tgs + jnp.int32(GAP_EXT)) > ts
            ts = jnp.where(ext, prev_tgs + jnp.int32(GAP_EXT), ts)
            tl = jnp.where(ext, ((prev_tgl + 1 + 128) % 256) - 128, tl)
            sel = ts >= cell
            cell = jnp.where(sel, ts, cell)
            csx = jnp.where(sel, jnp.int32(0), csx)
            csy = jnp.where(sel, ((-tl + 128) % 256) - 128, csy)

            cell = jnp.where(valid, cell, jnp.int32(0))
            csx = jnp.where(valid, csx, jnp.int32(0))
            csy = jnp.where(valid, csy, jnp.int32(0))
            ls = jnp.where(valid, ls, jnp.int32(NEG))
            ll = jnp.where(valid, ll, jnp.int32(0))
            ts = jnp.where(valid, ts, jnp.int32(NEG))
            tl = jnp.where(valid, tl, jnp.int32(0))

            score_out[0, d - 2, :] = cell[0]
            sx_out[0, d - 2, :] = csx[0]
            sy_out[0, d - 2, :] = csy[0]
            sc2[...] = sc1[0:1, :]
            sc1[...] = cell
            lgs[...] = ls
            lgl[...] = ll
            tgs[...] = ts
            tgl[...] = tl
            return 0

        jax.lax.fori_loop(2, n + m + 1, step, 0)

    @jax.jit
    def run(ref, reads):
        B = reads.shape[0]
        # per-diagonal reference bases: adiag[d-2, j] = ref[d-j-1]
        dd = jnp.arange(2, n + m + 1)[:, None]
        jj = jnp.arange(m_pad)[None, :]
        ii = dd - jj - 1
        ok = (ii >= 0) & (ii < n)
        adiag = jnp.where(
            ok, ref.astype(jnp.int32)[jnp.clip(ii, 0, n - 1)],
            jnp.int32(NUCL_N + 2))
        reads_p = jnp.full((B, 1, m_pad), NUCL_N + 2, jnp.int32)
        # read base for lane j is reads[j-1]: place at offset 1
        reads_p = jax.lax.dynamic_update_slice(
            reads_p, reads.astype(jnp.int32)[:, None, :], (0, 0, 1))
        # per-program output block: one (n_diag, m_pad) slab per read
        fn = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((n_diag, m_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, n_diag, m_pad), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((B, n_diag, m_pad),
                                            jnp.int32)] * 3,
            scratch_shapes=[pltpu.VMEM((1, m_pad), jnp.int32)
                            for _ in range(6)],
            interpret=interpret,
        )
        score, sx, sy = fn(adiag, reads_p)
        # (B, n_diag, m_pad) -> diagonal-stacked (n_diag, B, m_pad)
        return (jnp.transpose(score, (1, 0, 2)),
                jnp.transpose(sx, (1, 0, 2)),
                jnp.transpose(sy, (1, 0, 2)))

    return run


def make_sw_pallas_lanes(n_cap: int, m_cap: int, interpret: bool = False):
    """Lane-batched SW: 128 reads per grid group at full VPU width.

    Layout: read position j on SUBLANES (m_sub = m_cap+1 rounded to 8),
    reads on LANES (128 per group), one anti-diagonal per grid step with
    the DP state persisting in VMEM scratch across steps. Every (j,
    lane) pair of a step is one live cell of that read's current
    diagonal, so VPU utilization is ~100% — versus 1/8 sublane for the
    one-read-per-program kernel above.

    The per-diagonal reference row is not materialized: a_n[j] must be
    ref[d-j-1], which is the previous step's row shifted down one
    sublane with ref[d-1] injected at j=0 — a rolling diagonal in
    scratch, fed one (1, 128) row per step.

    Supports a DIFFERENT reference per lane (per-lane length ``nvec``),
    so Smith-Waterman work from many gassembler regions batches into one
    launch (the reference aligns each region's reads to that region's
    reference, src/gassembler.c:1912-2006).

    Returns fn(refs int8[B, n_cap], reads int8[B, m_cap], nvec int32[B])
    -> (score, sx, sy) int32[n_diag, B, m_sub] diagonal-stacked like
    make_sw_jax (row r holds cells with i+j == r+2).
    """
    n, m = n_cap, m_cap
    m_sub = _round_up(m + 1, 8)   # sublanes: j = 0..m (+ padding)
    n_diag = n + m - 1
    SENT = NUCL_N + 2  # never matches: substitution scores 0

    def kernel(refs_cur, refs_prev, reads_ref, nvec_ref,
               score_out, sx_out, sy_out,
               a_n, sc2, sc1, lgs, lgl, tgs, tgl):
        d = pl.program_id(1)  # 0-based; diagonal dd = d + 2
        jsub = jax.lax.broadcasted_iota(jnp.int32, (m_sub, LANE), 0)
        nv = nvec_ref[0]  # (1, LANE)
        b_n = reads_ref[0]  # (m_sub, LANE): read base at j-1

        @pl.when(d == 0)
        def _():
            sc2[...] = jnp.zeros((m_sub, LANE), jnp.int32)
            sc1[...] = jnp.zeros((m_sub, LANE), jnp.int32)
            lgs[...] = jnp.full((m_sub, LANE), NEG, jnp.int32)
            lgl[...] = jnp.zeros((m_sub, LANE), jnp.int32)
            tgs[...] = jnp.full((m_sub, LANE), NEG, jnp.int32)
            tgl[...] = jnp.zeros((m_sub, LANE), jnp.int32)
            # seed the rolling ref diagonal: ref[0] at row 0, so the
            # first roll below lands it at j=1 (a_n[1] = ref[dd-2])
            seed = jnp.full((m_sub, LANE), SENT, jnp.int32)
            a_n[...] = jnp.concatenate([refs_prev[0, 0], seed[1:]], axis=0)

        # roll the reference diagonal: a_n[j] <- a_n[j-1], inject
        # ref[dd-1] at j=0 (rows past the ref length hold the sentinel)
        a = jnp.concatenate([refs_cur[0, 0], a_n[:-1]], axis=0)
        a_n[...] = a

        valid = (jsub >= 1) & (jsub <= m) \
            & (d + 2 - jsub >= 1) & (d + 2 - jsub <= nv)
        sub = jnp.where((a >= NUCL_N) | (b_n >= NUCL_N),
                        jnp.int32(N_SCORE),
                        jnp.where(a == b_n, jnp.int32(M_SCORE),
                                  jnp.int32(MM_SCORE)))
        zrow = jnp.zeros((1, LANE), jnp.int32)
        nrow = jnp.full((1, LANE), NEG, jnp.int32)
        # diag (i-1, j-1): sc2 shifted down one sublane
        dsc = jnp.concatenate([zrow, sc2[:-1]], axis=0) + sub
        take = dsc > 0
        cell = jnp.where(take, dsc, jnp.int32(0))
        csx = jnp.where(take, jnp.int32(-1), jnp.int32(0))
        csy = csx
        # left gap from (i, j-1): previous-diag state shifted down
        prev_lgs = jnp.concatenate([nrow, lgs[:-1]], axis=0)
        prev_lgl = jnp.concatenate([zrow, lgl[:-1]], axis=0)
        ls = cell + jnp.int32(GAP_OPEN)
        ext = (prev_lgs + jnp.int32(GAP_EXT)) > ls
        ls = jnp.where(ext, prev_lgs + jnp.int32(GAP_EXT), ls)
        ll = jnp.where(ext, ((prev_lgl + 1 + 128) % 256) - 128,
                       jnp.int32(0))
        sel = ls >= cell
        cell = jnp.where(sel, ls, cell)
        csx = jnp.where(sel, ((-ll + 128) % 256) - 128, csx)
        csy = jnp.where(sel, jnp.int32(0), csy)
        # top gap from (i-1, j): previous-diag state, same sublane
        ts = cell + jnp.int32(GAP_OPEN)
        ext = (tgs[...] + jnp.int32(GAP_EXT)) > ts
        ts = jnp.where(ext, tgs[...] + jnp.int32(GAP_EXT), ts)
        tl = jnp.where(ext, ((tgl[...] + 1 + 128) % 256) - 128,
                       jnp.int32(0))
        sel = ts >= cell
        cell = jnp.where(sel, ts, cell)
        csx = jnp.where(sel, jnp.int32(0), csx)
        csy = jnp.where(sel, ((-tl + 128) % 256) - 128, csy)

        cell = jnp.where(valid, cell, jnp.int32(0))
        score_out[0, 0] = cell
        sx_out[0, 0] = jnp.where(valid, csx, jnp.int32(0))
        sy_out[0, 0] = jnp.where(valid, csy, jnp.int32(0))
        sc2[...] = sc1[...]
        sc1[...] = cell
        lgs[...] = jnp.where(valid, ls, jnp.int32(NEG))
        lgl[...] = jnp.where(valid, ll, jnp.int32(0))
        tgs[...] = jnp.where(valid, ts, jnp.int32(NEG))
        tgl[...] = jnp.where(valid, tl, jnp.int32(0))

    @jax.jit
    def run(refs, reads, nvec):
        B = refs.shape[0]
        G = (B + LANE - 1) // LANE
        bp = G * LANE
        # lanes-last layout, padded to whole groups
        # extra unit dim: Mosaic requires the 2nd-minor block dim to be
        # a multiple of 8 or the full array dim — (.., 1, LANE) rows are
        refs_p = jnp.full((G, n_diag + 2, 1, LANE), SENT, jnp.int32)
        refs_p = refs_p.at[:, :n, 0].set(
            jnp.pad(refs.astype(jnp.int32), ((0, bp - B), (0, 0)),
                    constant_values=SENT).reshape(G, LANE, n)
            .transpose(0, 2, 1))
        reads_p = jnp.full((G, m_sub, LANE), NUCL_N + 2, jnp.int32)
        reads_p = reads_p.at[:, 1:m + 1].set(
            jnp.pad(reads.astype(jnp.int32), ((0, bp - B), (0, 0)),
                    constant_values=NUCL_N + 2).reshape(G, LANE, m)
            .transpose(0, 2, 1))
        nvec_p = jnp.pad(nvec.astype(jnp.int32), (0, bp - B)).reshape(
            G, 1, LANE)

        fn = pl.pallas_call(
            kernel,
            grid=(G, n_diag),
            in_specs=[
                # rolling-ref feed rows: ref[dd-1] and (seed) ref[dd-2]
                pl.BlockSpec((1, 1, 1, LANE), lambda g, d: (g, d + 1, 0, 0)),
                pl.BlockSpec((1, 1, 1, LANE), lambda g, d: (g, d, 0, 0)),
                pl.BlockSpec((1, m_sub, LANE), lambda g, d: (g, 0, 0)),
                pl.BlockSpec((1, 1, LANE), lambda g, d: (g, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, m_sub, LANE),
                             lambda g, d: (g, d, 0, 0)),
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((G, n_diag, m_sub, LANE),
                                            jnp.int32)] * 3,
            scratch_shapes=[pltpu.VMEM((m_sub, LANE), jnp.int32)
                            for _ in range(7)],
            interpret=interpret,
        )
        score, sx, sy = fn(refs_p, refs_p, reads_p, nvec_p)
        # (G, n_diag, m_sub, LANE) -> diagonal-stacked (n_diag, B, m_sub)
        out = []
        for x in (score, sx, sy):
            x = jnp.transpose(x, (1, 0, 3, 2)).reshape(n_diag, bp, m_sub)
            out.append(x[:, :B])
        return tuple(out)

    return run


def sw_pallas_matrices(ref: np.ndarray, reads: np.ndarray,
                       interpret: bool = False):
    """Host wrapper mirroring ops.swalign.sw_matrices_batch's output
    (score/sx/sy int16/int8 row-major matrices)."""
    from genometester4_tpu.ops.swalign import diag_to_matrix

    n = len(ref)
    m = reads.shape[1]
    run = make_sw_pallas(n, m, interpret=interpret)
    score_d, sx_d, sy_d = (np.asarray(x) for x in run(
        jnp.asarray(ref), jnp.asarray(reads)))
    score = diag_to_matrix(score_d, n, m).astype(np.int16)
    sx = diag_to_matrix(sx_d, n, m).astype(np.int8)
    sy = diag_to_matrix(sy_d, n, m).astype(np.int8)
    return score, sx, sy


@functools.lru_cache(maxsize=None)
def _lanes_cached(n_cap8: int, m_cap8: int, interpret: bool):
    return make_sw_pallas_lanes(n_cap8, m_cap8, interpret=interpret)


def sw_matrices_batch_device(ref: np.ndarray, reads: np.ndarray,
                             interpret: bool = False):
    """Drop-in device twin of ops.swalign.sw_matrices_batch backed by the
    lane-batched kernel. Shapes are padded to multiples of 8 so repeated
    gassembler regions reuse a handful of compiled kernels."""
    return sw_matrices_batch_device_multi([(ref, reads)],
                                          interpret=interpret)[0]


def sw_matrices_batch_device_multi(region_inputs, interpret: bool = False):
    """MANY regions' SW fills in ONE lane-batched launch (round-5
    VERDICT #5: cross-region device batching).

    ``region_inputs``: list of (ref int8[n_i], reads int8[B_i, m_i]).
    Returns a list of per-region (score, sx, sy) matrices, each sliced
    to its own [B_i, n_i+1, m_i+1] — integer-identical to per-region
    launches (the kernel is per-lane: every read carries its OWN
    reference and reference length, make_sw_pallas_lanes).

    Why: a typical gassembler region has 30-300 usable reads, so a
    per-region launch fills a fraction of the 128-lane groups and pays
    one dispatch per region (src/gassembler.c:1912-2006 is the per-
    region loop). Packing the pending window's reads fills whole lane
    groups and amortizes the launch; caps are padded to the window
    maxima (multiples of 8) so a handful of compiled kernels serve all
    windows."""
    from genometester4_tpu.ops.swalign import diag_to_matrix
    # ensure_jax: axon plugin registration under the bin/ -S launchers
    from genometester4_tpu.utils.lazyjax import ensure_jax
    jnp = ensure_jax().numpy

    n_cap = _round_up(max(max(len(r) for r, _ in region_inputs), 8), 8)
    m_cap = _round_up(max(max(b.shape[1] for _, b in region_inputs), 8), 8)
    B = sum(b.shape[0] for _, b in region_inputs)
    run = _lanes_cached(n_cap, m_cap, interpret)
    refs = np.full((B, n_cap), NUCL_N + 2, np.int8)
    reads_p = np.full((B, m_cap), NUCL_N + 2, np.int8)
    nvec = np.empty(B, np.int32)
    off = 0
    for ref, batch in region_inputs:
        bi, mi = batch.shape
        refs[off:off + bi, : len(ref)] = ref
        reads_p[off:off + bi, :mi] = batch
        nvec[off:off + bi] = len(ref)
        off += bi
    sc_d, sx_d, sy_d = (np.asarray(x) for x in run(
        jnp.asarray(refs), jnp.asarray(reads_p), jnp.asarray(nvec)))
    score = diag_to_matrix(sc_d, n_cap, m_cap)
    sx = diag_to_matrix(sx_d, n_cap, m_cap)
    sy = diag_to_matrix(sy_d, n_cap, m_cap)
    out = []
    off = 0
    for ref, batch in region_inputs:
        bi, mi = batch.shape
        n = len(ref)
        out.append((
            score[off:off + bi, : n + 1, : mi + 1].astype(np.int16),
            sx[off:off + bi, : n + 1, : mi + 1].astype(np.int8),
            sy[off:off + bi, : n + 1, : mi + 1].astype(np.int8)))
        off += bi
    return out
