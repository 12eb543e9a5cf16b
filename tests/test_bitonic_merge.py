"""Unit tests for ops/bitonic_merge_pallas (interpret mode on CPU).

The kernel is the building block of the hybrid-sort experiment
(tools/sort_experiment.py, round-3 VERDICT next #5) and the identified
headroom for the mesh merge stage (BASELINE.md "Mesh overhead").
"""

import numpy as np
import pytest

import jax

from genometester4_tpu.ops.bitonic_merge_pallas import (
    make_block_merge, merge_round)


def _ref_sorted(k1, k2):
    order = np.lexsort((k2, k1))
    return k1[order], k2[order]


@pytest.mark.parametrize("L", [128, 1024, 4096])
@pytest.mark.parametrize("n_pairs", [1, 3])
def test_merge_round_matches_numpy(L, n_pairs):
    rng = np.random.default_rng(L + n_pairs)
    n = 2 * L * n_pairs
    # low-cardinality k1 forces ties so the k2 tiebreak is exercised
    k1 = rng.integers(0, 7, n).astype(np.uint32)
    k2 = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    # pre-sort each L run (the merge_round precondition)
    for s in range(0, n, L):
        o = np.lexsort((k2[s:s + L], k1[s:s + L]))
        k1[s:s + L] = k1[s:s + L][o]
        k2[s:s + L] = k2[s:s + L][o]
    m1, m2 = jax.jit(
        lambda a, b: merge_round(a, b, L, interpret=True))(k1, k2)
    m1, m2 = np.asarray(m1), np.asarray(m2)
    for s in range(0, n, 2 * L):
        e1, e2 = _ref_sorted(k1[s:s + 2 * L], k2[s:s + 2 * L])
        assert np.array_equal(m1[s:s + 2 * L], e1)
        assert np.array_equal(m2[s:s + 2 * L], e2)


def test_block_merge_start_d_partial_network():
    """start_d < span/2: block halves already exchanged at larger
    distances (the hybrid deep-round shape) finish sorting."""
    rng = np.random.default_rng(9)
    span = 2048
    k1 = rng.integers(0, 1 << 31, span).astype(np.uint32)
    k2 = rng.integers(0, 1 << 31, span).astype(np.uint32)
    # build a bitonic block, apply the first stage (distance span/2)
    # in numpy, then let the kernel finish from start_d = span/4
    o = np.lexsort((k2[:span // 2], k1[:span // 2]))
    k1[:span // 2], k2[:span // 2] = k1[:span // 2][o], k2[:span // 2][o]
    o = np.lexsort((k2[span // 2:], k1[span // 2:]))
    k1[span // 2:] = k1[span // 2:][o][::-1]
    k2[span // 2:] = k2[span // 2:][o][::-1]
    exp1, exp2 = _ref_sorted(k1.copy(), k2.copy())
    d = span // 2
    a = np.stack([k1[:d], k1[d:]]); b = np.stack([k2[:d], k2[d:]])
    swap = (a[0] > a[1]) | ((a[0] == a[1]) & (b[0] > b[1]))
    a0 = np.where(swap, a[1], a[0]); a1 = np.where(swap, a[0], a[1])
    b0 = np.where(swap, b[1], b[0]); b1 = np.where(swap, b[0], b[1])
    k1 = np.concatenate([a0, a1]); k2 = np.concatenate([b0, b1])

    import jax.numpy as jnp
    fn = make_block_merge(1, span, start_d=span // 4, interpret=True)
    i1 = jax.lax.bitcast_convert_type(
        jnp.asarray(k1).reshape(-1, 128), jnp.int32)
    i2 = jax.lax.bitcast_convert_type(
        jnp.asarray(k2).reshape(-1, 128), jnp.int32)
    o1, o2 = fn(i1, i2)
    o1 = np.asarray(jax.lax.bitcast_convert_type(o1, jnp.uint32)).ravel()
    o2 = np.asarray(jax.lax.bitcast_convert_type(o2, jnp.uint32)).ravel()
    assert np.array_equal(o1, exp1)
    assert np.array_equal(o2, exp2)
