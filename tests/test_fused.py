"""Fused single-pass EM (Pallas kernel, interpret mode on CPU) vs the
unfused reference-grade path."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.ops.counts import dense_counts
from vireo_tpu.ops.pallas_em import fused_estep_stats, pad_to
from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                    default_priors, em_step, fit_vb)
from vireo_tpu.models.vireo_fused import (prepare_fused,
                                          run_fused_iters_n,
                                          fused_fit_vb)


def _setup(small_data, K=3):
    AD, DP, _ = small_data
    cfg = VireoConfig(n_var=AD.shape[0], n_cell=AD.shape[1], n_donor=K)
    counts = dense_counts(AD, DP, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    state = init_state(cfg, rng=rng, dtype=jnp.float32)
    priors = default_priors(cfg, dtype=jnp.float32)
    return cfg, counts, state, priors


def test_kernel_matches_reference_math(small_data):
    cfg, counts, state, priors = _setup(small_data)
    rng = np.random.RandomState(1)
    V, C, K = cfg.n_var, cfg.n_cell, cfg.n_donor
    Wa = jnp.asarray(rng.randn(V, K), jnp.float32) * 0.1
    Wd = jnp.asarray(rng.randn(V, K), jnp.float32) * 0.1

    ad8 = pad_to(jnp.asarray(np.asarray(counts.ad), jnp.int8), (32, 64))
    dp8 = pad_to(jnp.asarray(np.asarray(counts.dp), jnp.int8), (32, 64))
    Wa_p = pad_to(Wa, (32, 1))
    Wd_p = pad_to(Wd, (32, 1))
    prior = priors.id_log.astype(jnp.float32).reshape(1, K)

    S1, SS, id_prob, ll_out, lb_p, kl_id = fused_estep_stats(
        ad8, dp8, Wa_p, Wd_p, prior, cell_block=64, interpret=True)

    # reference computation in f32 numpy
    adf = np.asarray(counts.ad, np.float32)
    dpf = np.asarray(counts.dp, np.float32)
    loglik = adf.T @ np.asarray(Wa) + dpf.T @ np.asarray(Wd)
    logp = loglik + np.asarray(prior)
    logp -= logp.max(axis=1, keepdims=True)
    e = np.exp(logp)
    idp = e / e.sum(axis=1, keepdims=True)

    np.testing.assert_allclose(np.asarray(id_prob)[:C], idp,
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(S1)[:V], adf @ idp,
                               rtol=2e-2, atol=0.2)
    np.testing.assert_allclose(np.asarray(SS)[:V], dpf @ idp,
                               rtol=2e-2, atol=0.2)
    ref_lb = np.sum(loglik * idp)
    np.testing.assert_allclose(float(lb_p), ref_lb, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ll_out)[:C], loglik,
                               rtol=2e-2, atol=1e-2)


def test_fused_doublet_matches_host_path(small_data, monkeypatch):
    """predict_doublet's single-pass Pallas path (interpret mode) agrees
    with the host path on int8 counts: same calls, close probabilities,
    same refreshed GT."""
    from vireo_tpu.ops.counts import counts_from_scipy
    from vireo_tpu.models.vireo import Vireo
    from vireo_tpu.models.doublet import predict_doublet

    AD, DP, _ = small_data
    counts = counts_from_scipy(AD, DP, max_dense_elems=10)
    assert counts.ad.dtype == jnp.int8

    def fitted():
        np.random.seed(5)
        m = Vireo(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3,
                  dtype=jnp.float32)
        m.fit(counts, max_iter=25, min_iter=3, verbose=False)
        return m

    monkeypatch.setenv("VIREO_FUSED_DOUBLET", "0")
    m_host = fitted()
    db_h, sg_h, llr_h = predict_doublet(m_host, counts, None)

    monkeypatch.setenv("VIREO_FUSED_DOUBLET", "interpret")
    m_fused = fitted()
    db_f, sg_f, llr_f = predict_doublet(m_fused, counts, None)

    assert (np.argmax(sg_f, 1) == np.argmax(sg_h, 1)).all()
    np.testing.assert_allclose(sg_f, sg_h, atol=2e-3)
    np.testing.assert_allclose(db_f, db_h, atol=2e-3)
    # logLik differences inherit the kernel's bf16 weight rounding
    np.testing.assert_allclose(llr_f, llr_h, rtol=5e-2, atol=0.25)
    np.testing.assert_allclose(m_fused.GT_prob, m_host.GT_prob,
                               atol=2e-3)


def test_fused_loop_matches_unfused(small_data):
    cfg, counts, state, priors = _setup(small_data)
    data = prepare_fused(counts, cell_block=64)

    st_f, elbo_f = run_fused_iters_n(data, state, priors, cfg, 5,
                                     cell_block=64, interpret=True)

    # unfused f32 path, same number of iterations
    st = state
    for _ in range(5):
        st, _, elbo = em_step(counts, st, priors, cfg, update_theta=True)

    np.testing.assert_allclose(float(elbo_f), float(elbo), rtol=5e-3)
    agree = np.mean(np.argmax(np.asarray(st_f.id_prob)[:cfg.n_cell], 1)
                    == np.argmax(np.asarray(st.id_prob), 1))
    assert agree > 0.99, agree


def test_fused_fit_converges(small_data):
    cfg, counts, state, priors = _setup(small_data)
    data = prepare_fused(counts, cell_block=64)
    st, elbo_ref, elbo_fin, n_iter = fused_fit_vb(
        data, state, priors, cfg, max_iter=60, min_iter=5,
        cell_block=64, interpret=True)
    assert np.isfinite(float(elbo_fin))
    assert int(n_iter) < 60
    res = fit_vb(counts, state, priors, cfg, max_iter=60, min_iter=5)
    np.testing.assert_allclose(float(elbo_fin), float(res.elbo_final),
                               rtol=5e-3)
    assert st.id_prob.shape == (cfg.n_cell, cfg.n_donor)
