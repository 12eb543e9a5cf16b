"""Device k-mer extraction.

Replaces the reference's rolling-word byte state machine
(src/fasta.c:218-264 — one base at a time, maintaining forward word and
reverse complement incrementally) with a vectorized window build: for a
chunk of 2-bit base codes, all L-k+1 windows are materialized with k
shifted adds, invalid windows are masked via a prefix-sum over the
invalid indicator, and canonicalization is an element-wise min against
the vectorized reverse complement.

All shapes are static: chunks are padded to a fixed length so the jitted
program compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from genometester4_tpu.ops.encode import canonical_pair


@partial(jax.jit, static_argnames=("k", "canonical"))
def extract_kmers(codes, k: int, canonical: bool = True):
    """Extract all k-windows from a code chunk.

    Parameters
    ----------
    codes : uint8[L] — 2-bit base codes; 255 marks invalid bases and
        record separators (windows containing one are masked out).
    k : static word length, 1..32.

    Returns
    -------
    (hi, lo, valid): uint32[N], uint32[N], bool[N] with N = L - k + 1.
    Invalid windows carry arbitrary word bits and valid=False.
    """
    if not 1 <= k <= 32:
        raise ValueError("word length must be 1..32")
    L = codes.shape[0]
    n = L - k + 1
    invalid = codes == jnp.uint8(255)
    c = jnp.where(invalid, jnp.uint8(0), codes).astype(jnp.uint32)

    # validity: no invalid byte inside the window
    bad_prefix = jnp.cumsum(invalid.astype(jnp.int32))
    bad_in_window = bad_prefix[k - 1:] - jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), bad_prefix[: n - 1]])
    valid = bad_in_window == 0

    # rolling word build: base j of the window lands at bit 2*(k-1-j)
    n_hi = max(0, k - 16)  # first n_hi bases form the high u32
    lo = jnp.zeros((n,), jnp.uint32)
    for j in range(n_hi, k):
        lo = lo | (jax.lax.dynamic_slice(c, (j,), (n,)) << (2 * (k - 1 - j)))
    if n_hi:
        hi = jnp.zeros((n,), jnp.uint32)
        for j in range(n_hi):
            hi = hi | (jax.lax.dynamic_slice(c, (j,), (n,)) << (2 * (n_hi - 1 - j)))
    else:
        hi = jnp.zeros((n,), jnp.uint32)

    if canonical:
        hi, lo = canonical_pair(hi, lo, k)
    return hi, lo, valid
