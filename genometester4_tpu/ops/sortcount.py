"""Device sort + segmented count — the counting heart of the engine.

The reference counts k-mers by radix-sorting per-thread tables
(src/utils.c:101-198) and run-length scanning (src/word-table.c:233-258),
then k-way merging sorted tables/files (src/glistmaker.c:1081-1154,
src/set-operations.c:40-129). On TPU both collapse into one primitive:

    sort by (hi, lo) → mark run heads → segment-sum weights

XLA's sort is a tuned bitonic network on the VPU; the reduction is a
cumsum + scatter, all fused. Merging M already-deduped sorted shards is
the same primitive applied to their concatenation with per-word weights.

Everything is static-shape: inputs are padded, outputs are padded, and
``n_unique`` travels as a scalar.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def count_unique(hi, lo, weights, valid):
    """Dedupe-and-sum over arbitrary (unsorted) word pairs.

    Parameters
    ----------
    hi, lo : uint32[N] — word pairs (need not be sorted)
    weights : uint32[N] — per-entry count contribution (1 for raw k-mers,
        existing counts when merging shards)
    valid : bool[N] — entries to include

    Returns
    -------
    (uhi, ulo, counts, n_unique): sorted unique words in the first
    ``n_unique`` slots (ascending unsigned 64-bit order), their summed
    counts, and the scalar count of uniques. Tail slots are zero.
    """
    n = hi.shape[0]
    # Sort invalid entries to the end with a leading flag key, so no word
    # sentinel is needed (an all-ones word is a legal k=32 k-mer).
    inv = (~valid).astype(jnp.uint32)
    inv, shi, slo, w = jax.lax.sort((inv, hi, lo, weights), num_keys=3)
    svalid = inv == 0
    w = jnp.where(svalid, w, 0)

    first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    head = first & svalid
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # id of owning unique word
    n_unique = jnp.maximum(seg[-1] + 1, 0) * jnp.any(svalid)

    counts = jax.ops.segment_sum(w, seg, num_segments=n,
                                 indices_are_sorted=True)
    # compact the unique words: head entries scatter to their segment slot
    idx = jnp.where(head, seg, n)  # out-of-bounds rows are dropped
    uhi = jnp.zeros((n,), jnp.uint32).at[idx].set(shi, mode="drop")
    ulo = jnp.zeros((n,), jnp.uint32).at[idx].set(slo, mode="drop")
    return uhi, ulo, counts.astype(jnp.uint32), n_unique


@partial(jax.jit, static_argnames=("min_count", "max_count"))
def filter_counts(hi, lo, counts, n_unique, min_count: int = 1,
                  max_count: int | None = None):
    """Apply frequency cutoffs (glistmaker -c/--max) and recompact.

    Returns (hi, lo, counts, n_kept) with survivors in the leading slots.
    """
    n = hi.shape[0]
    in_range = jnp.arange(n) < n_unique
    keep = in_range & (counts >= jnp.uint32(min_count))
    if max_count is not None:
        keep &= counts <= jnp.uint32(max_count)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, pos, n)
    out_hi = jnp.zeros((n,), jnp.uint32).at[idx].set(hi, mode="drop")
    out_lo = jnp.zeros((n,), jnp.uint32).at[idx].set(lo, mode="drop")
    out_c = jnp.zeros((n,), jnp.uint32).at[idx].set(counts, mode="drop")
    return out_hi, out_lo, out_c, jnp.sum(keep.astype(jnp.int32))
