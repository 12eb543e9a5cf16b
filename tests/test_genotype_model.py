"""Agreement tests: the jnp TPU genotype model vs the exact native path.

The jnp model (float32, log-space) is the throughput path; it must make
the same best-genotype decisions as the bit-exact native library on all
but boundary-tied markers.
"""

import ctypes

import numpy as np

from genometester4_tpu.models import fastgt_native as native
from genometester4_tpu.models.genotype import (GT_MU, genotype_calls_batch,
                                               genotype_log_posteriors)


def test_gt_mu_table_matches_reference_model(rng):
    """Every (genotype, mu-level) pair must reproduce the reference's
    per-genotype negbin means (src/genotypes.c:50-125) — checked by
    comparing posteriors against the native exact implementation."""
    lib = native.get_lib()
    lib.fgx_genotype_probabilities.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_float, ctypes.c_uint,
        ctypes.c_uint] + [ctypes.c_double] * 7
    params = [0.05, 4.26e-05, 0.0149, 0.985, 31.2, 65.48, -0.679]
    pB = 0.37
    n = 300
    ca = rng.integers(0, 70, n)
    cb = rng.integers(0, 70, n)
    import jax.numpy as jnp
    lp = np.asarray(genotype_log_posteriors(
        jnp.asarray(ca, jnp.float32), jnp.asarray(cb, jnp.float32),
        pB, *params))
    for i in range(0, n, 17):
        a = (ctypes.c_double * 15)()
        lib.fgx_genotype_probabilities(a, pB, int(ca[i]), int(cb[i]),
                                       *params)
        exact = np.array(list(a))
        with np.errstate(divide="ignore"):
            exact_lp = np.log(exact)
        finite = np.isfinite(exact_lp) & np.isfinite(lp[i])
        # same ranking of genotypes (floating error aside)
        assert np.argmax(exact) == np.argmax(lp[i]) or np.isclose(
            np.sort(exact)[-1], np.sort(exact)[-2], rtol=1e-3)
        np.testing.assert_allclose(lp[i][finite], exact_lp[finite],
                                   rtol=2e-3, atol=2e-3)


def test_batch_calls_agree_with_native(rng):
    params = np.array([0.0547, 4.26e-05, 0.0149, 0.985, 28.7, 65.48,
                       -0.679], np.float32)
    pB = 0.29
    n = 5000
    counts = rng.integers(0, 90, 2 * n).astype(np.uint16)
    best_j, prob_j = genotype_calls_batch(counts, pB, params)
    a, sums, best_n = native.genotype_batch(counts, pB, params)
    agree = (best_j == best_n.astype(np.int32))
    # ties/boundaries may flip under float32: require near-total agreement
    assert agree.mean() > 0.995, agree.mean()
    pn = a[np.arange(n), best_n] / sums
    ok = np.isfinite(pn) & agree
    np.testing.assert_allclose(prob_j[ok], pn[ok], rtol=5e-2, atol=5e-3)
