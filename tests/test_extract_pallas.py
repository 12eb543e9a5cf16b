"""Pallas window-extraction kernel vs the XLA doubling build."""

import numpy as np
import pytest

from tests.conftest import rng  # noqa: F401


@pytest.mark.parametrize("k", [1, 5, 16, 25, 32])
def test_extract_pallas_matches_xla(rng, k):
    import jax.numpy as jnp
    from genometester4_tpu.ops.kmers import extract_kmers
    from genometester4_tpu.ops.extract_pallas import make_extract_pallas

    n = 128 * 128 * 2
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.integers(0, n, size=n // 40)] = 255
    run = make_extract_pallas(n, k, rows=128, interpret=True)
    hi_p, lo_p, v_p = (np.asarray(x) for x in run(jnp.asarray(codes)))
    hi_x, lo_x, v_x = (np.asarray(x) for x in extract_kmers(
        jnp.asarray(codes), k, canonical=True))
    nw = n - k + 1
    assert (v_p[:nw] == v_x).all()
    assert not v_p[nw:].any()  # tail windows forced invalid
    m = v_x
    np.testing.assert_array_equal(hi_p[:nw][m], hi_x[m])
    np.testing.assert_array_equal(lo_p[:nw][m], lo_x[m])


def test_extract_pallas_non_canonical(rng):
    import jax.numpy as jnp
    from genometester4_tpu.ops.kmers import extract_kmers
    from genometester4_tpu.ops.extract_pallas import make_extract_pallas

    n = 128 * 128
    k = 21
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    run = make_extract_pallas(n, k, canonical=False, rows=128,
                              interpret=True)
    hi_p, lo_p, v_p = (np.asarray(x) for x in run(jnp.asarray(codes)))
    hi_x, lo_x, v_x = (np.asarray(x) for x in extract_kmers(
        jnp.asarray(codes), k, canonical=False))
    nw = n - k + 1
    m = v_x
    np.testing.assert_array_equal(hi_p[:nw][m], hi_x[m])
    np.testing.assert_array_equal(lo_p[:nw][m], lo_x[m])


def test_run_marks_pallas_matches_xla(rng):
    """Pallas run-marks kernel == count_unique(compact=False) marks and
    the bench checksum, across block seams and the invalid tail."""
    import jax.numpy as jnp
    from genometester4_tpu.ops.runmarks_pallas import make_run_marks

    HB = 18
    n = 1024 * 128 * 2
    n_valid = int(n * 0.9)
    words = np.sort(rng.integers(0, 1 << 49, size=n_valid,
                                 dtype=np.uint64))
    dup = rng.random(n_valid) < 0.3
    words[dup] = words[np.maximum(np.flatnonzero(dup) - 1, 0)]
    words = np.sort(words)
    packed = np.full(n, 0xFFFFFFFF, np.uint32)
    lo = np.full(n, 0xFFFFFFFF, np.uint32)
    packed[:n_valid] = (words >> np.uint64(32)).astype(np.uint32)
    lo[:n_valid] = words.astype(np.uint32)

    run = make_run_marks(n, HB, rows=512, interpret=True)
    head, tail, nuni, tot, chk = (np.asarray(x) for x in run(
        jnp.asarray(packed), jnp.asarray(lo)))

    first = np.concatenate([[True], words[1:] != words[:-1]])
    exp_head = np.zeros(n, bool)
    exp_head[:n_valid] = first
    exp_tail = np.zeros(n, bool)
    exp_tail[:n_valid] = np.concatenate([first[1:], [True]])
    np.testing.assert_array_equal(head, exp_head)
    np.testing.assert_array_equal(tail, exp_tail)
    assert int(nuni) == int(exp_head.sum())
    assert int(tot) == n_valid
    pos = np.arange(n, dtype=np.uint32)
    x = (packed & np.uint32((1 << HB) - 1)) ^ lo
    exp_chk = ((x[exp_tail] * (pos[exp_tail] + 1)).sum(dtype=np.uint32)
               - (x[exp_head] * pos[exp_head]).sum(dtype=np.uint32))
    assert np.uint32(chk) == exp_chk
