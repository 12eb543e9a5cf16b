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
