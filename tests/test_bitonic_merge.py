"""Unit tests for ops/bitonic_merge_pallas (interpret mode on CPU).

The kernel is the building block of the hybrid-sort experiment
(tools/sort_experiment.py, round-3 VERDICT next #5) and the identified
headroom for the mesh merge stage (BASELINE.md "Mesh overhead").
"""

import numpy as np
import pytest

import jax

from genometester4_tpu.ops.bitonic_merge_pallas import (
    make_block_merge, merge_round, merge_sorted_runs)


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


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("L,n_runs", [(256, 2), (256, 8), (1024, 4),
                                      (64, 4), (1, 8)])
def test_merge_sorted_runs_with_payload(L, n_runs, use_pallas):
    """merge_sorted_runs (the mesh merge building block, round-5
    VERDICT #1): arbitrary run lengths via big-distance XLA stages +
    the in-VMEM Pallas tail, with a payload array moved by the same
    decisions. Merging log2(n_runs) rounds must equal a full sort,
    and the payload must stay attached to its key (keys made unique
    so payload attachment is well-defined)."""
    rng = np.random.default_rng(L * 31 + n_runs + use_pallas)
    n = L * n_runs
    perm = rng.permutation(n).astype(np.uint64)
    k1 = (perm >> np.uint64(3)).astype(np.uint32)   # ties in k1
    k2 = (perm & np.uint64(7)).astype(np.uint32) | (
        rng.integers(0, 1 << 28, n).astype(np.uint32) << np.uint32(3))
    # make (k1,k2) unique: replace k2 with a permutation-derived value
    k2 = perm.astype(np.uint32)
    v = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    by_key = {(int(a) << 32) | int(b): int(p)
              for a, b, p in zip(k1, k2, v)}
    for s in range(0, n, L):
        o = np.lexsort((k2[s:s + L], k1[s:s + L]))
        k1[s:s + L] = k1[s:s + L][o]
        k2[s:s + L] = k2[s:s + L][o]
        v[s:s + L] = v[s:s + L][o]

    def run(a, b, c):
        run_len = L
        while run_len < n:
            a, b, c = merge_sorted_runs((a, b, c), run_len,
                                        use_pallas=use_pallas,
                                        interpret=use_pallas)
            run_len *= 2
        return a, b, c

    m1, m2, mv = (np.asarray(x) for x in jax.jit(run)(k1, k2, v))
    order = np.lexsort((k2, k1))
    assert np.array_equal(m1, k1[order])
    assert np.array_equal(m2, k2[order])
    expect_v = np.array([by_key[(int(a) << 32) | int(b)]
                         for a, b in zip(m1, m2)], dtype=np.uint32)
    assert np.array_equal(mv, expect_v)


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
