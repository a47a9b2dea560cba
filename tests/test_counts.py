"""Dense vs sparse Counts backend equivalence."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.ops.counts import dense_counts, sparse_counts


def _both(small_data):
    AD, DP, _ = small_data
    d = dense_counts(AD, DP, dtype=jnp.float64)
    s = sparse_counts(AD, DP, dtype=jnp.float64, pad_multiple=64)
    return d, s


def test_shapes(small_data):
    d, s = _both(small_data)
    assert d.n_var == s.n_var and d.n_cell == s.n_cell


def test_suff_stats_equal(small_data):
    d, s = _both(small_data)
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.rand(d.n_cell, 4))
    S1d, SSd = d.suff_stats(W)
    S1s, SSs = s.suff_stats(W)
    np.testing.assert_allclose(np.asarray(S1d), np.asarray(S1s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(SSd), np.asarray(SSs), rtol=1e-10)


def test_cell_loglik_equal(small_data):
    d, s = _both(small_data)
    rng = np.random.RandomState(1)
    Wa = jnp.asarray(rng.randn(d.n_var, 4))
    Wd = jnp.asarray(rng.randn(d.n_var, 4))
    np.testing.assert_allclose(np.asarray(d.cell_loglik(Wa, Wd)),
                               np.asarray(s.cell_loglik(Wa, Wd)),
                               rtol=1e-10, atol=1e-10)


def test_reductions_equal(small_data):
    d, s = _both(small_data)
    np.testing.assert_allclose(float(d.binom_coeff_sum()),
                               float(s.binom_coeff_sum()), rtol=1e-10)
    ad_d, dp_d = d.row_sums()
    ad_s, dp_s = s.row_sums()
    np.testing.assert_allclose(np.asarray(ad_d), np.asarray(ad_s))
    np.testing.assert_allclose(np.asarray(dp_d), np.asarray(dp_s))
    np.testing.assert_array_equal(np.asarray(d.n_vars_per_cell()),
                                  np.asarray(s.n_vars_per_cell()))


def test_densify_roundtrip(small_data):
    AD, DP, _ = small_data
    s = sparse_counts(AD, DP, dtype=jnp.float64, pad_multiple=64)
    d = s.densify()
    np.testing.assert_allclose(np.asarray(d.ad), AD.toarray())
    np.testing.assert_allclose(np.asarray(d.dp), DP.toarray())
