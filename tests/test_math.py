"""Parity of the math kernel library with the reference implementation."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.ops import math as vmath


def test_normalize_matches_reference(reference):
    X = np.random.RandomState(0).rand(3, 5, 8)
    for axis in (-1, 0, 1):
        ours = np.asarray(vmath.normalize(jnp.asarray(X), axis=axis))
        ref = reference.base.normalize(X, axis=axis)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_loglik_amplify_matches_reference(reference):
    X = np.random.RandomState(1).rand(4, 6) * 100 - 50
    ours = np.asarray(vmath.loglik_amplify(jnp.asarray(X), axis=-1))
    ref = reference.base.loglik_amplify(X, axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_beta_entropy_and_kl_match_reference(reference):
    from vireoSNP.utils.vireo_base import beta_entropy as ref_beta_entropy

    s = np.array([[364., 24197], [5886, 7475], [6075, 397]])
    p = np.array([[0.3, 29.7], [3., 3.], [29.7, 0.3]])

    ours_H = float(vmath.beta_entropy(jnp.asarray(s[:, 0]),
                                      jnp.asarray(s[:, 1])))
    np.testing.assert_allclose(ours_H, ref_beta_entropy(s), rtol=1e-8)

    ours_KL = float(vmath.beta_entropy(
        jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]),
        jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1])))
    np.testing.assert_allclose(ours_KL, ref_beta_entropy(s, p), rtol=1e-8)


def test_get_binom_coeff_matches_reference(reference):
    rng = np.random.RandomState(2)
    DP = rng.poisson(5, size=(20, 30)).astype(float)
    AD = np.minimum(rng.poisson(2, size=(20, 30)), DP).astype(float)
    ours = vmath.get_binom_coeff(AD, DP)
    ref = reference.get_binom_coeff(AD, DP)
    np.testing.assert_allclose(np.sort(ours), np.sort(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.sum(), ref.sum(), rtol=1e-6)


def test_kl_categorical_zero_for_prior():
    P = np.full((5, 4), 0.25)
    val = float(vmath.kl_categorical(jnp.asarray(P),
                                     jnp.asarray(np.log(P))))
    assert abs(val) < 1e-12


def test_softmax_from_loglik_normalized():
    X = np.random.RandomState(3).randn(7, 4) * 30
    logp = np.log(np.full((1, 4), 0.25))
    S = np.asarray(vmath.softmax_from_loglik(jnp.asarray(X),
                                             jnp.asarray(logp)))
    np.testing.assert_allclose(S.sum(-1), 1.0, rtol=1e-12)
    assert (S >= 0).all()


def test_betaln_matches_scipy():
    """Our betaln (gammaln composition) tracks scipy to ~1e-12;
    jax.scipy.special.betaln is up to ~1e-6 off in this range, which
    moved ELBO values (and occasionally the convergence iteration)
    away from the reference."""
    from scipy.special import betaln as scipy_betaln
    from vireo_tpu.ops.math import betaln
    rng = np.random.RandomState(0)
    a = rng.rand(3000) * 60 + 0.01
    b = rng.rand(3000) * 60 + 0.01
    got = np.asarray(betaln(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, scipy_betaln(a, b),
                               rtol=1e-12, atol=1e-11)
