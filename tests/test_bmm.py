"""Binomial mixture model parity with the reference, incl. the bundled
mitochondrial demo data."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.io.matrices import read_mtx
from vireo_tpu.models.bmm import BinomMixtureVB

MITO_DIR = "/root/reference/data/mitoDNA"


def _mito_data():
    AD = read_mtx(MITO_DIR + "/cellSNP.tag.AD.mtx")
    DP = read_mtx(MITO_DIR + "/cellSNP.tag.DP.mtx")
    return AD, DP


def test_bmm_step_parity(reference):
    rng = np.random.RandomState(8)
    n_var, n_cell, K = 20, 30, 2
    DP = rng.poisson(8, size=(n_var, n_cell)).astype(float)
    AD = rng.binomial(DP.astype(int), 0.3).astype(float)

    np.random.seed(31)
    ref = reference.BinomMixtureVB(n_cell=n_cell, n_var=n_var, n_donor=K)
    np.random.seed(31)
    ours = BinomMixtureVB(n_cell=n_cell, n_var=n_var, n_donor=K,
                          dtype=jnp.float64)
    np.testing.assert_allclose(ours.ID_prob, ref.ID_prob, rtol=1e-12)

    # one manual coordinate-ascent iteration on each side
    from vireo_tpu.models.bmm import bmm_step
    from vireo_tpu.ops.counts import dense_counts
    counts = dense_counts(AD, DP, dtype=jnp.float64)

    for _ in range(3):
        ref.update_theta_size(AD, DP)
        logLik = ref.get_E_logLik(AD, DP)
        ref.update_ID_prob(logLik_ID=logLik)
        ref_elbo = ref.get_ELBO(logLik_ID=logLik)

        ours.state, _, elbo = bmm_step(counts, ours.state, ours.priors)
        np.testing.assert_allclose(ours.beta_mu, ref.beta_mu, rtol=1e-9)
        np.testing.assert_allclose(ours.ID_prob, ref.ID_prob, rtol=1e-7,
                                   atol=1e-12)
        np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


def test_bmm_fit_mito_demo(reference):
    AD, DP = _mito_data()
    n_var, n_cell = AD.shape
    K = 2

    np.random.seed(42)
    ref = reference.BinomMixtureVB(n_cell=n_cell, n_var=n_var, n_donor=K)
    ref.fit(AD, DP, min_iter=30, n_init=10, random_seed=42)

    ours = BinomMixtureVB(n_cell=n_cell, n_var=n_var, n_donor=K,
                          dtype=jnp.float64)
    ours.fit(AD, DP, min_iter=30, n_init=10, random_seed=42)

    np.testing.assert_allclose(np.sort(ours.ELBO_inits),
                               np.sort(ref.ELBO_inits), rtol=1e-6)
    np.testing.assert_allclose(ours.ELBO_iters[-1], ref.ELBO_iters[-1],
                               rtol=1e-6)
    # same clone assignment (up to label permutation)
    a = np.argmax(ours.ID_prob, axis=1)
    b = np.argmax(ref.ID_prob, axis=1)
    agree = max(np.mean(a == b), np.mean(a == 1 - b))
    assert agree == 1.0


def test_bmm_elbo_monotone():
    AD, DP = _mito_data()
    ours = BinomMixtureVB(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3,
                          dtype=jnp.float64)
    ours.fit(AD, DP, min_iter=30, n_init=5, random_seed=1)
    deltas = np.diff(ours.ELBO_iters)
    assert (deltas > -1e-6).all()
