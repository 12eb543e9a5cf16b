"""Unit tests for 2-bit encoding / reverse complement / canonicalization.

Oracle: pure-python reimplementation of src/sequence.c semantics plus the
reference binary where available.
"""

import numpy as np
import jax.numpy as jnp

from genometester4_tpu.ops.encode import (
    string_to_word, word_to_string, words_to_strings,
    reverse_complement_u64, canonical_u64, split_u64, join_u64,
    reverse_complement_pair, canonical_pair,
)


def ref_revcomp(word: int, k: int) -> int:
    """Literal transcription of src/sequence.c:65-79 semantics."""
    word = ~word & 0xFFFFFFFFFFFFFFFF
    out = 0
    for _ in range(k):
        out = ((out << 2) | (word & 3)) & 0xFFFFFFFFFFFFFFFF
        word >>= 2
    return out


def test_string_roundtrip():
    for s in ["A", "ACGT", "TTTTTTTTTTTTTTTT", "ACGTACGTACGTACGTACGTACGTACGTACGT"]:
        w = string_to_word(s)
        assert word_to_string(w, len(s)) == s


def test_words_to_strings_vectorized(rng):
    k = 21
    words = rng.integers(0, 1 << (2 * k), size=50, dtype=np.uint64)
    assert words_to_strings(words, k) == [word_to_string(int(w), k) for w in words]


def test_revcomp_host_matches_reference_semantics(rng):
    for k in [1, 2, 7, 15, 16, 17, 25, 31, 32]:
        words = rng.integers(0, 1 << min(2 * k, 63), size=100, dtype=np.uint64)
        got = reverse_complement_u64(words, k)
        want = np.array([ref_revcomp(int(w), k) for w in words], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_revcomp_string_sanity():
    w = string_to_word("ACGTT")
    rc = int(reverse_complement_u64(np.array([w], np.uint64), 5)[0])
    assert word_to_string(rc, 5) == "AACGT"


def test_device_pair_revcomp_matches_host(rng):
    for k in [3, 11, 16, 17, 24, 32]:
        words = rng.integers(0, 1 << min(2 * k, 63), size=257, dtype=np.uint64)
        hi, lo = split_u64(words)
        rhi, rlo = reverse_complement_pair(jnp.asarray(hi), jnp.asarray(lo), k)
        got = join_u64(np.asarray(rhi), np.asarray(rlo))
        np.testing.assert_array_equal(got, reverse_complement_u64(words, k))


def test_device_canonical_matches_host(rng):
    for k in [5, 16, 19, 32]:
        words = rng.integers(0, 1 << min(2 * k, 63), size=257, dtype=np.uint64)
        hi, lo = split_u64(words)
        chi, clo = canonical_pair(jnp.asarray(hi), jnp.asarray(lo), k)
        got = join_u64(np.asarray(chi), np.asarray(clo))
        np.testing.assert_array_equal(got, canonical_u64(words, k))


def test_canonical_idempotent(rng):
    k = 16
    words = rng.integers(0, 1 << 32, size=100, dtype=np.uint64)
    c = canonical_u64(words, k)
    np.testing.assert_array_equal(canonical_u64(c, k), c)
