"""Pallas TPU kernel: run head/tail marks over a sorted k-mer stream.

After the big sort, count_unique(compact=False) needs only element-wise
neighbour compares (ops/sortcount.py), but XLA's lowering of the
shifted 1D compares + mark-weighted reductions costs ~60-75 ms at 50M
elements on a v5e when nearly every element is unique (a data-dependent
cliff; ~25 ms on run-heavy data). This kernel is one fixed-cost pass:
each grid step loads a block of the sorted (packed, lo) stream,
compares against the previous element (carried across blocks in SMEM —
the TPU grid is sequential) and the next element (halo: the next
block's leading rows), writes head/tail masks, and accumulates
n_unique / total / the bench checksum in SMEM.

Mark semantics match ops.sortcount.count_unique(compact=False,
unit_weights=True) exactly; see that docstring. Everything runs in
int32 (Mosaic can neither reduce unsigned vectors nor truncate reused
i8 masks); all ops used are bitwise-identical mod 2^32.
"""

from __future__ import annotations

import functools

from genometester4_tpu.utils.lazyjax import jax, jnp
from genometester4_tpu.utils.lazyjax import pallas as pl, pallas_tpu as pltpu

LANE = 128
DEF_ROWS = 2048  # 2048x128 = 256Ki elements (1 MB/operand) per block


@functools.lru_cache(maxsize=None)
def make_run_marks(n: int, hi_bits: int, rows: int = DEF_ROWS,
                   interpret: bool = False, write_masks: bool = True):
    """Build the marks kernel for a fixed stream length.

    Returns fn(packed u32[n], lo u32[n]) ->
      (head bool[n], tail bool[n], n_unique i32, total i32, checksum u32)
    with checksum = sum over runs of ((packed & word_mask) ^ lo) * count
    computed as sum(tail * x * (pos+1)) - sum(head * x * pos) — exact
    because word@tail == word@head within a run.
    """
    assert n % LANE == 0, "stream length must be lane-aligned"
    n_rows = n // LANE
    rows = min(rows, n_rows)
    assert n_rows % rows == 0, (
        f"stream length {n} must tile {rows}x{LANE} blocks — pad the "
        f"input to a multiple of {rows * LANE}")
    block = rows * LANE
    grid = n_rows // rows
    hrows = 8  # halo: only the next block's first 8 rows are read
    assert rows % hrows == 0
    word_mask = (1 << hi_bits) - 1
    hi_mask = (-1 << hi_bits) & 0xFFFFFFFF
    hi_mask_i32 = hi_mask - (1 << 32) if hi_mask >= (1 << 31) else hi_mask

    def kernel(cur_p, cur_l, nxt_p, nxt_l, *outs):
        if write_masks:
            head_out, tail_out, nuni_ref, tot_ref, chk_ref, carry = outs
        else:
            nuni_ref, tot_ref, chk_ref, carry = outs
        b = pl.program_id(0)
        last = pl.num_programs(0) - 1

        @pl.when(b == 0)
        def _():
            nuni_ref[0, 0] = jnp.int32(0)
            tot_ref[0, 0] = jnp.int32(0)
            chk_ref[0, 0] = jnp.int32(0)
            carry[0] = jnp.int32(-1)  # invalid-flagged sentinel
            carry[1] = jnp.int32(-1)

        p = cur_p[...]
        l = cur_l[...]
        svalid = (p & hi_mask_i32) == 0

        col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
        first_cell = (col == 0) & (row == 0)

        def prev_of(x, carry_val):
            a = pltpu.roll(x, 1, 1)         # a[r,c] = x[r, (c-1) % LANE]
            brow = pltpu.roll(x, 1, 0)      # brow[r,c] = x[r-1 mod, c]
            blast = pltpu.roll(brow, 1, 1)  # blast[r,0] = x[r-1, LANE-1]
            out = jnp.where(col == 0, blast, a)
            return jnp.where(first_cell, carry_val, out)

        prev_p = prev_of(p, carry[0])
        prev_l = prev_of(l, carry[1])
        head = svalid & ((prev_p != p) | (prev_l != l))

        last_cell = (col == LANE - 1) & (row == rows - 1)

        def next_of(x, halo_val):
            a = pltpu.roll(x, LANE - 1, 1)  # a[r,c] = x[r, (c+1) % LANE]
            brow = pltpu.roll(x, rows - 1, 0)
            bfirst = pltpu.roll(brow, LANE - 1, 1)
            out = jnp.where(col == LANE - 1, bfirst, a)
            return jnp.where(last_cell, halo_val, out)

        is_last_block = b == last
        halo_p = jnp.where(is_last_block, jnp.int32(-1), nxt_p[0, 0])
        halo_l = jnp.where(is_last_block, jnp.int32(-1), nxt_l[0, 0])
        next_p = next_of(p, halo_p)
        next_l = next_of(l, halo_l)
        # an appended sentinel is invalid-flagged, so the stream's last
        # valid element always differs from its successor
        tail = svalid & ((next_p != p) | (next_l != l)
                         | ((next_p & hi_mask_i32) != 0))

        if write_masks:
            head_out[...] = head
            tail_out[...] = tail

        pos = jnp.int32(b * block) + row * LANE + col
        x = (p & word_mask) ^ l
        chk_ref[0, 0] += (jnp.sum(jnp.where(tail, x * (pos + 1), 0))
                          - jnp.sum(jnp.where(head, x * pos, 0)))
        nuni_ref[0, 0] += jnp.sum(head.astype(jnp.int32))
        tot_ref[0, 0] += jnp.sum(svalid.astype(jnp.int32))
        carry[0] = p[rows - 1, LANE - 1]
        carry[1] = l[rows - 1, LANE - 1]

    n_hblocks = n_rows // hrows
    hstep = rows // hrows

    @jax.jit
    def run(packed, lo):
        p2 = jax.lax.bitcast_convert_type(packed, jnp.int32).reshape(
            n_rows, LANE)
        l2 = jax.lax.bitcast_convert_type(lo, jnp.int32).reshape(
            n_rows, LANE)
        mask_specs = [pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                      pl.BlockSpec((rows, LANE), lambda b: (b, 0))] \
            if write_masks else []
        mask_shapes = [jax.ShapeDtypeStruct((n_rows, LANE), jnp.bool_)] * 2 \
            if write_masks else []
        fn = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                pl.BlockSpec((rows, LANE), lambda b: (b, 0)),
                # halo: the NEXT block's leading rows (clamped at end)
                pl.BlockSpec((hrows, LANE), lambda b: (
                    jnp.minimum((b + 1) * hstep, n_hblocks - 1), 0)),
                pl.BlockSpec((hrows, LANE), lambda b: (
                    jnp.minimum((b + 1) * hstep, n_hblocks - 1), 0)),
            ],
            out_specs=mask_specs + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=mask_shapes + [
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            interpret=interpret,
        )
        outs = fn(p2, l2, p2, l2)
        if write_masks:
            head, tail, nuni, tot, chk = outs
            head, tail = head.reshape(n), tail.reshape(n)
        else:
            nuni, tot, chk = outs
            head = tail = None
        return (head, tail, nuni[0, 0], tot[0, 0],
                jax.lax.bitcast_convert_type(chk[0, 0], jnp.uint32))

    return run
