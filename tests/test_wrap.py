"""Full vireo_wrap orchestrator parity with the reference, across the
donor-prior mode branches."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.engine.wrap import vireo_wrap


def _ref_wrap(reference, AD, DP, **kw):
    from vireoSNP.utils.vireo_wrap import vireo_wrap as ref_wrap
    return ref_wrap(AD, DP, nproc=1, **kw)


def _assert_results_close(res, ref, rtol=1e-4, atol=1e-7):
    np.testing.assert_allclose(res['ID_prob'], ref['ID_prob'],
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(res['GT_prob'], ref['GT_prob'],
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(res['doublet_prob'], ref['doublet_prob'],
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(res['doublet_LLR'], ref['doublet_LLR'],
                               rtol=rtol, atol=1e-5)
    np.testing.assert_allclose(res['LB_list'], ref['LB_list'],
                               rtol=1e-6)
    np.testing.assert_allclose(res['LB_doublet'], ref['LB_doublet'],
                               rtol=1e-6)


def test_wrap_genotype_free(small_data, reference):
    AD, DP, _ = small_data
    kw = dict(n_donor=3, learn_GT=True, n_init=4, random_seed=7,
              check_doublet=True)
    ref = _ref_wrap(reference, AD, DP, **kw)
    res = vireo_wrap(AD, DP, dtype=jnp.float64, **kw)
    _assert_results_close(res, ref)


def test_wrap_with_gt_prior(small_data, reference):
    AD, DP, _ = small_data
    rng = np.random.RandomState(3)
    GT_prior = rng.dirichlet([1] * 3, size=(AD.shape[0], 3))
    kw = dict(GT_prior=GT_prior, n_donor=3, learn_GT=False, n_init=1,
              random_seed=11)
    ref = _ref_wrap(reference, AD, DP, **kw)
    res = vireo_wrap(AD, DP, dtype=jnp.float64, **kw)
    _assert_results_close(res, ref)


def test_wrap_subset_prior(small_data, reference):
    AD, DP, _ = small_data
    rng = np.random.RandomState(5)
    GT_prior = rng.dirichlet([1] * 3, size=(AD.shape[0], 4))
    kw = dict(GT_prior=GT_prior, n_donor=2, learn_GT=False, n_init=1,
              random_seed=13)
    ref = _ref_wrap(reference, AD, DP, **kw)
    res = vireo_wrap(AD, DP, dtype=jnp.float64, **kw)
    _assert_results_close(res, ref)


def test_wrap_superset_prior(small_data, reference):
    AD, DP, _ = small_data
    rng = np.random.RandomState(6)
    GT_prior = rng.dirichlet([1] * 3, size=(AD.shape[0], 2))
    kw = dict(GT_prior=GT_prior, n_donor=3, learn_GT=True, n_init=3,
              random_seed=17)
    ref = _ref_wrap(reference, AD, DP, **kw)
    res = vireo_wrap(AD, DP, dtype=jnp.float64, **kw)
    _assert_results_close(res, ref, rtol=1e-3, atol=1e-6)


def test_wrap_extra_donor(small_data, reference):
    AD, DP, _ = small_data
    kw = dict(n_donor=3, learn_GT=True, n_init=3, random_seed=19,
              n_extra_donor=1)
    ref = _ref_wrap(reference, AD, DP, **kw)
    res = vireo_wrap(AD, DP, dtype=jnp.float64, **kw)
    _assert_results_close(res, ref, rtol=1e-3, atol=1e-6)
