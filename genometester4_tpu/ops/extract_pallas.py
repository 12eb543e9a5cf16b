"""Pallas TPU kernel: k-mer window extraction + canonicalization.

The XLA path (ops.kmers.extract_kmers) builds windows by logarithmic
doubling, but every doubling step materializes a full-length array in
HBM (~31 ms at 50M windows on a v5e). Here each grid block loads its
codes (plus a one-tile halo for windows crossing the block edge), runs
the whole doubling chain in VMEM, canonicalizes, and writes only the
final (hi, lo, valid) — one HBM pass.

Flat shifts inside a (rows, 128) VMEM block use the two-roll trick:
shift by s < 128 is a lane roll combined with a row roll selected on
the lane index; shifts >= 128 add a whole-row offset. The halo supplies
the next block's leading rows so every window of this block completes.

Semantics are identical to ops.kmers.extract_kmers (same 2-bit codes,
255 = invalid resets the window, canonical = min(word, revcomp)) except
the output covers ALL n positions of the padded input: windows starting
in the final k-1 slots are marked invalid (their bases would cross the
array end), so callers must pad inputs with >= k-1 trailing 255 bytes —
which the chunking pipelines already do.
"""

from __future__ import annotations

import functools

from genometester4_tpu.utils.lazyjax import jax, jnp
import numpy as np
from genometester4_tpu.utils.lazyjax import pallas as pl, pallas_tpu as pltpu

LANE = 128
DEF_ROWS = 1024  # 1024x128 = 128Ki windows per block


def _flat_shift(x, s: int, rows: int, col, sentinel):
    """out[i] = x[i + s] over the flat (rows, LANE) layout, filling the
    final s slots from the halo-extended rows (caller guarantees x has
    the halo rows appended logically via ``sentinel`` selection)."""
    if s == 0:
        return x
    q, r = divmod(s, LANE)
    if r == 0:
        rolled = pltpu.roll(x, rows - q, 0)
        return rolled
    a = pltpu.roll(x, LANE - r, 1)             # a[.., c] = x[.., c+r mod]
    a = pltpu.roll(a, rows - q, 0)             # rows shifted by q
    b = pltpu.roll(x, rows - q - 1, 0)         # rows shifted by q+1
    b = pltpu.roll(b, LANE - r, 1)
    # lanes c < LANE - r take row-offset q; lanes c >= LANE - r wrapped
    # into the next row (offset q+1)
    return jnp.where(col < LANE - r, a, b)


@functools.lru_cache(maxsize=None)
def make_extract_pallas(n: int, k: int, canonical: bool = True,
                        rows: int = DEF_ROWS, interpret: bool = False):
    """Build the extraction kernel for a fixed padded length ``n``.

    Returns fn(codes uint8[n]) -> (hi u32[n], lo u32[n], valid bool[n]).
    ``n`` must tile (rows*LANE); trailing k-1 positions come out invalid.
    """
    assert n % LANE == 0
    n_rows = n // LANE
    rows = min(rows, n_rows)
    assert n_rows % rows == 0, f"n={n} must tile {rows * LANE}"
    grid = n_rows // rows
    # halo: k-1 <= 31 lookahead bases always fit one extra row; codes
    # enter as int32 (Mosaic lacks 8-bit rotates/truncations), so the
    # halo block is one (8, 128) int32 tile
    hrows = 8
    assert rows % 8 == 0

    if k == 32:
        chunks = [16, 16]
    else:
        chunks = [1 << b for b in range(4, -1, -1) if k & (1 << b)]

    def kernel(cur_ref, halo_ref, hi_out, lo_out, valid_out):
        b = pl.program_id(0)
        last = pl.num_programs(0) - 1
        col = jax.lax.broadcasted_iota(jnp.int32, (rows + hrows, LANE), 1)
        c_cur = cur_ref[...]
        c_halo = halo_ref[...]
        # on the last block the "halo" maps to this block's own leading
        # rows — poison it so tail windows come out invalid
        c_halo = jnp.where(b == last, jnp.int32(255), c_halo)
        c = jnp.concatenate([c_cur, c_halo], axis=0)  # (rows+hrows, LANE)
        # flags ride as int32 ARITHMETIC, not booleans: Mosaic rotates
        # only 32-bit data, and a reused i1 materializes as i8 whose
        # round-trip truncation is unsupported. bad = c >> 7 (only 255
        # has bit 7); invalid positions keep garbage low bits, which the
        # bad flag masks out of every window downstream.
        bad = jax.lax.shift_right_logical(c, 7)

        ext = rows + hrows
        # logarithmic doubling in VMEM: W[m] packs m bases, bad[m] flags
        W = {1: c}
        B = {1: bad}
        m = 1
        while 2 * m <= min(k, 16):
            sh = _flat_shift(W[m], m, ext, col, None)
            W[2 * m] = (W[m] << (2 * m)) | sh
            B[2 * m] = B[m] | _flat_shift(B[m], m, ext, col, None)
            m *= 2
        while 2 * m <= k:
            B[2 * m] = B[m] | _flat_shift(B[m], m, ext, col, None)
            m *= 2

        hi = jnp.zeros((ext, LANE), jnp.int32)
        lo = jnp.zeros((ext, LANE), jnp.int32)
        bad_k = jnp.zeros((ext, LANE), jnp.int32)
        s = 0
        for p in chunks:
            if s:
                bits = 2 * p
                if bits < 32:
                    hi = (hi << bits) | jax.lax.shift_right_logical(
                        lo, 32 - bits)
                    lo = lo << bits
                else:
                    hi, lo = lo, jnp.zeros_like(lo)
            lo = lo | _flat_shift(W[p], s, ext, col, None)
            bad_k = bad_k | _flat_shift(B[p], s, ext, col, None)
            s += p

        if canonical:
            # reverse complement on (hi, lo) int32 pairs, bitwise-exact
            def rev2(x):
                m2, m4, m8 = 0x33333333, 0x0F0F0F0F, 0x00FF00FF
                x = ((x & m2) << 2) | (jax.lax.shift_right_logical(x, 2)
                                       & m2)
                x = ((x & m4) << 4) | (jax.lax.shift_right_logical(x, 4)
                                       & m4)
                x = ((x & m8) << 8) | (jax.lax.shift_right_logical(x, 8)
                                       & m8)
                return (x << 16) | jax.lax.shift_right_logical(x, 16)

            chi, clo = ~hi, ~lo
            rhi, rlo = rev2(clo), rev2(chi)
            sft = 64 - 2 * k
            if sft:
                if sft < 32:
                    rlo = jax.lax.shift_right_logical(rlo, sft) | (
                        rhi << (32 - sft))
                    rhi = jax.lax.shift_right_logical(rhi, sft)
                elif sft == 32:
                    rlo, rhi = rhi, jnp.zeros_like(rhi)
                else:
                    rlo = jax.lax.shift_right_logical(rhi, sft - 32)
                    rhi = jnp.zeros_like(rhi)
            if k <= 16:
                rhi = jnp.zeros_like(rhi)

            # all-arithmetic select (reused i1 vectors hit Mosaic's
            # unsupported i8->i1 truncation): unsigned order via the
            # sign-bit flip, flags as 0/1 ints, select via bitmasks
            MIN32 = jnp.int32(-2147483648)

            def u_lt01(a, b):
                return jnp.where((a ^ MIN32) < (b ^ MIN32),
                                 jnp.int32(1), jnp.int32(0))

            eq01 = jnp.where(rhi == hi, jnp.int32(1), jnp.int32(0))
            take = u_lt01(rhi, hi) | (eq01 & u_lt01(rlo, lo))
            mask = jnp.int32(0) - take  # all-ones where take
            hi = (rhi & mask) | (hi & ~mask)
            lo = (rlo & mask) | (lo & ~mask)

        hi_out[...] = hi[:rows]
        lo_out[...] = lo[:rows]
        valid_out[...] = bad_k[:rows]  # 0 = valid (int32: Mosaic can't
        # truncate vector stores to i8)

    n_hblocks = n_rows // 8
    hstep = rows // 8

    @jax.jit
    def run(codes):
        c2 = codes.astype(jnp.int32).reshape(n_rows, LANE)
        fn = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                pl.BlockSpec((hrows, LANE), lambda b: (
                    jnp.minimum((b + 1) * hstep, n_hblocks - 1), 0)),
            ],
            out_specs=[
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
            ],
            interpret=interpret,
        )
        hi, lo, bad = fn(c2, c2)
        return (jax.lax.bitcast_convert_type(hi, jnp.uint32).reshape(n),
                jax.lax.bitcast_convert_type(lo, jnp.uint32).reshape(n),
                (bad == 0).reshape(n))

    return run
