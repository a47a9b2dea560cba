"""Core Vireo model: single-step and full-fit parity with the reference,
plus ELBO-monotonicity property tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vireo_tpu.ops.counts import dense_counts
from vireo_tpu.models.vireo import (VireoConfig, VireoState, init_state,
                                    default_priors, em_step, fit_vb, Vireo)


def _setup(small_data, reference, seed=3, ase=False, learn_GT=True,
           gt_prior=None):
    AD, DP, _ = small_data
    n_var, n_cell = AD.shape
    K = 3

    np.random.seed(seed)
    ref_model = reference.Vireo(n_cell=n_cell, n_var=n_var, n_donor=K,
                                learn_GT=learn_GT, ASE_mode=ase,
                                GT_prob_init=gt_prior)
    ref_model.set_prior(GT_prior=gt_prior)

    cfg = VireoConfig(n_var=n_var, n_cell=n_cell, n_donor=K,
                      learn_GT=learn_GT, ASE_mode=ase)
    np.random.seed(seed)
    state = init_state(cfg, GT_prob_init=gt_prior, dtype=jnp.float64)
    priors = default_priors(cfg, GT_prior=gt_prior, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(state.id_prob), ref_model.ID_prob,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state.gt_prob), ref_model.GT_prob,
                               rtol=1e-12)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    return counts, cfg, state, priors, ref_model, AD.tocsc(), DP.tocsc()


def _ref_one_iter(ref_model, AD, DP, update_theta=True):
    if update_theta:
        ref_model.update_theta_size(AD, DP)
    if ref_model.learn_GT:
        ref_model.update_GT_prob(AD, DP)
    logLik_ID = ref_model.update_ID_prob(AD, DP)
    return ref_model.get_ELBO(logLik_ID)


def test_em_step_parity(small_data, reference):
    counts, cfg, state, priors, ref_model, AD, DP = _setup(
        small_data, reference)

    for it in range(3):
        ref_elbo = _ref_one_iter(ref_model, AD, DP)
        state, loglik_id, elbo = em_step(counts, state, priors, cfg,
                                         update_theta=True)
        np.testing.assert_allclose(np.asarray(state.beta_mu),
                                   ref_model.beta_mu, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(state.beta_sum),
                                   ref_model.beta_sum, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(state.gt_prob),
                                   ref_model.GT_prob, rtol=1e-7, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.id_prob),
                                   ref_model.ID_prob, rtol=1e-7, atol=1e-12)
        np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


def test_em_step_parity_ase_mode(small_data, reference):
    counts, cfg, state, priors, ref_model, AD, DP = _setup(
        small_data, reference, ase=True)
    for it in range(2):
        ref_elbo = _ref_one_iter(ref_model, AD, DP)
        state, _, elbo = em_step(counts, state, priors, cfg,
                                 update_theta=True)
        np.testing.assert_allclose(np.asarray(state.beta_mu),
                                   ref_model.beta_mu, rtol=1e-9)
        np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


def test_em_step_delay_theta(small_data, reference):
    counts, cfg, state, priors, ref_model, AD, DP = _setup(
        small_data, reference, seed=7)
    # delayed theta: first iteration must not touch beta
    ref_elbo = _ref_one_iter(ref_model, AD, DP, update_theta=False)
    state, _, elbo = em_step(counts, state, priors, cfg, update_theta=False)
    np.testing.assert_allclose(np.asarray(state.beta_mu), ref_model.beta_mu,
                               rtol=1e-12)
    np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


def test_fit_vb_matches_reference_fit(small_data, reference):
    counts, cfg, state, priors, ref_model, AD, DP = _setup(
        small_data, reference, seed=5)
    ref_elbo_trace = ref_model._fit_VB(AD, DP, max_iter=30, min_iter=5,
                                       epsilon_conv=1e-2,
                                       delay_fit_theta=3, verbose=False)
    res = fit_vb(counts, state, priors, cfg, max_iter=30, min_iter=5,
                 epsilon_conv=1e-2, delay_fit_theta=3)
    n_it = int(res.n_iter)
    trace = np.asarray(res.elbo_trace)[:n_it]
    # reference returns ELBO[:it] (drops the last executed iteration)
    np.testing.assert_allclose(trace[:len(ref_elbo_trace)], ref_elbo_trace,
                               rtol=1e-8)
    assert n_it - 1 == len(ref_elbo_trace)
    np.testing.assert_allclose(float(res.elbo_ref), ref_elbo_trace[-1],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.state.id_prob),
                               ref_model.ID_prob, rtol=1e-6, atol=1e-10)


def test_fit_vb_learn_gt_false(small_data, reference):
    AD, DP, _ = small_data
    rng = np.random.RandomState(0)
    gt_prior = rng.dirichlet([1] * 3, size=(AD.shape[0], 3))
    counts, cfg, state, priors, ref_model, AD, DP = _setup(
        small_data, reference, seed=9, learn_GT=False, gt_prior=gt_prior)
    ref_trace = ref_model._fit_VB(AD, DP, max_iter=25, min_iter=5,
                                  verbose=False)
    res = fit_vb(counts, state, priors, cfg, max_iter=25, min_iter=5)
    trace = np.asarray(res.elbo_trace)[:int(res.n_iter)]
    np.testing.assert_allclose(trace[:len(ref_trace)], ref_trace, rtol=1e-8)


def test_elbo_monotone_increasing(small_data):
    AD, DP, _ = small_data
    cfg = VireoConfig(n_var=AD.shape[0], n_cell=AD.shape[1], n_donor=3)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    rng = np.random.RandomState(42)
    state = init_state(cfg, rng=rng, dtype=jnp.float64)
    priors = default_priors(cfg, dtype=jnp.float64)
    res = fit_vb(counts, state, priors, cfg, max_iter=50, min_iter=5)
    trace = np.asarray(res.elbo_trace)[:int(res.n_iter)]
    deltas = np.diff(trace)
    assert (deltas > -1e-6).all(), f"ELBO decreased: {deltas.min()}"


def test_vireo_class_api(small_data):
    AD, DP, _ = small_data
    model = Vireo(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3,
                  dtype=jnp.float64)
    model.fit(AD, DP, max_iter=40)
    assert model.ID_prob.shape == (AD.shape[1], 3)
    np.testing.assert_allclose(model.ID_prob.sum(1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(model.GT_prob.sum(-1), 1.0, rtol=1e-9)
    assert len(model.ELBO_) > 1


def test_em_step_parity_fix_beta_sum(small_data, reference):
    """fix_beta_sum freezes the Beta concentration
    (vireo_model.py:184-185)."""
    AD, DP, _ = small_data
    n_var, n_cell = AD.shape
    K = 3
    np.random.seed(7)
    ref_model = reference.Vireo(n_cell=n_cell, n_var=n_var, n_donor=K,
                                fix_beta_sum=True)
    ref_model.set_prior()
    cfg = VireoConfig(n_var=n_var, n_cell=n_cell, n_donor=K,
                      fix_beta_sum=True)
    np.random.seed(7)
    state = init_state(cfg, dtype=jnp.float64)
    priors = default_priors(cfg, dtype=jnp.float64)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    beta_sum0 = np.asarray(state.beta_sum).copy()
    ADc, DPc = AD.tocsc(), DP.tocsc()
    for _ in range(2):
        ref_elbo = _ref_one_iter(ref_model, ADc, DPc)
        state, _, elbo = em_step(counts, state, priors, cfg,
                                 update_theta=True)
        np.testing.assert_allclose(np.asarray(state.beta_sum), beta_sum0)
        np.testing.assert_allclose(np.asarray(state.beta_mu),
                                   ref_model.beta_mu, rtol=1e-9)
        np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


def test_em_step_parity_learn_theta_false(small_data, reference):
    """learn_theta=False pins theta entirely (vireo_model.py:258)."""
    AD, DP, _ = small_data
    n_var, n_cell = AD.shape
    K = 3
    np.random.seed(9)
    ref_model = reference.Vireo(n_cell=n_cell, n_var=n_var, n_donor=K,
                                learn_theta=False)
    ref_model.set_prior()
    cfg = VireoConfig(n_var=n_var, n_cell=n_cell, n_donor=K,
                      learn_theta=False)
    np.random.seed(9)
    state = init_state(cfg, dtype=jnp.float64)
    priors = default_priors(cfg, dtype=jnp.float64)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    mu0 = np.asarray(state.beta_mu).copy()
    ADc, DPc = AD.tocsc(), DP.tocsc()
    for _ in range(2):
        if ref_model.learn_GT:
            ref_model.update_GT_prob(ADc, DPc)
        logLik_ID = ref_model.update_ID_prob(ADc, DPc)
        ref_elbo = ref_model.get_ELBO(logLik_ID)
        state, _, elbo = em_step(counts, state, priors, cfg,
                                 update_theta=True)
        np.testing.assert_allclose(np.asarray(state.beta_mu), mu0)
        np.testing.assert_allclose(np.asarray(state.gt_prob),
                                   ref_model.GT_prob, rtol=1e-7,
                                   atol=1e-12)
        np.testing.assert_allclose(float(elbo), ref_elbo, rtol=1e-9)


# ---------------------------------------------------------------------
# Runtime self-checks: the reference warns on ELBO decreases > 1e-6 and
# on hitting max_iter without converging (vireo_model.py:265-272,
# bmm_model.py:190-199). The device loop returns the full ELBO trace;
# warnings are replayed host-side with the exact reference predicate.
# ---------------------------------------------------------------------

def test_warn_from_trace_decrease_and_nonconvergence(capsys):
    from vireo_tpu.models.vireo import warn_from_trace

    # decreasing trace past min_iter: CAVI is monotone by construction,
    # so a genuine decrease only arises from numerical error; the
    # warning logic is exercised on a synthetic trace instead.
    trace = np.array([-100.0, -90.0, -80.0, -85.0, -70.0, -75.0])
    n_dec = warn_from_trace(trace, n_iter=6, max_iter=200, min_iter=1)
    out = capsys.readouterr().out
    assert n_dec == 2
    assert out.count("Warning: Lower bound decreases!") == 2

    # max_iter hit without convergence
    trace = np.array([-100.0, -90.0, -89.0, -88.0])
    warn_from_trace(trace, n_iter=4, max_iter=4, min_iter=1)
    out = capsys.readouterr().out
    assert "Warning: VB did not converge!" in out

    # bmm-style message carries the two ELBO values
    trace = np.array([-100.0, -90.0, -95.0])
    warn_from_trace(trace, n_iter=3, max_iter=200, min_iter=1, style="bmm")
    out = capsys.readouterr().out
    assert "Warning: ELBO decreases -90.00000000 to -95.00000000!" in out


def test_fit_emits_nonconvergence_warning(small_data, capsys):
    """End-to-end: a fit whose budget forces max_iter to be reached
    surfaces the reference's self-check through Vireo.fit."""
    from vireo_tpu.models.vireo import Vireo

    AD, DP, _ = small_data
    np.random.seed(3)
    m = Vireo(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3)
    # min_iter=48 defers the convergence break until iteration 49,
    # which is max_iter-1: the reference prints either the decrease or
    # the non-convergence warning there, deterministically.
    m.fit(AD, DP, max_iter=50, min_iter=48, verbose=True)
    out = capsys.readouterr().out
    assert ("Warning: VB did not converge!" in out
            or "Warning: Lower bound decreases!" in out)

    # and verbose=False stays silent (the wrapper's warm/refit path)
    np.random.seed(3)
    m = Vireo(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3)
    m.fit(AD, DP, max_iter=50, min_iter=48, verbose=False)
    assert "Warning" not in capsys.readouterr().out


def test_randomized_flag_combo_parity(reference):
    """Full-fit parity vs the reference across randomized flag
    COMBINATIONS (ASE x learn_GT x learn_theta x fix_beta_sum x
    delay_fit_theta x GT prior) — the per-flag tests above cover each
    axis alone; this seals the cross-terms."""
    import scipy.sparse as sp
    master = np.random.RandomState(42)
    for trial in range(6):
        V, C, K = (int(master.randint(20, 50)),
                   int(master.randint(30, 80)), int(master.randint(2, 5)))
        dp = (master.rand(V, C) < 0.4) * master.poisson(4, (V, C))
        ad = master.binomial(dp, master.rand())
        AD, DP = sp.csc_matrix(ad * 1.0), sp.csc_matrix(dp * 1.0)

        ase = bool(master.randint(2))
        learn_GT = bool(master.randint(2))
        learn_theta = bool(master.randint(2))
        fix_beta_sum = bool(master.randint(2))
        delay = int(master.randint(0, 4))
        use_prior = bool(master.randint(2)) or not learn_GT
        gt_prior = None
        if use_prior:
            gp = master.rand(V, K, 3)
            gt_prior = gp / gp.sum(-1, keepdims=True)
        seed = int(master.randint(10000))

        np.random.seed(seed)
        ref_model = reference.Vireo(
            n_cell=C, n_var=V, n_donor=K, learn_GT=learn_GT,
            learn_theta=learn_theta, ASE_mode=ase,
            fix_beta_sum=fix_beta_sum, GT_prob_init=gt_prior)
        ref_model.set_prior(GT_prior=gt_prior)
        # _fit_VB: the pre-binom trace (the reference's binomial
        # constant is computed in f32, a reporting-only offset)
        ref_trace = ref_model._fit_VB(AD, DP, max_iter=30, min_iter=5,
                                      delay_fit_theta=delay,
                                      verbose=False)

        cfg = VireoConfig(n_var=V, n_cell=C, n_donor=K,
                          learn_GT=learn_GT, learn_theta=learn_theta,
                          ASE_mode=ase, fix_beta_sum=fix_beta_sum)
        np.random.seed(seed)
        state = init_state(cfg, GT_prob_init=gt_prior, dtype=jnp.float64)
        priors = default_priors(cfg, GT_prior=gt_prior, dtype=jnp.float64)
        counts = dense_counts(AD, DP, dtype=jnp.float64)
        res = fit_vb(counts, state, priors, cfg, max_iter=30, min_iter=5,
                     delay_fit_theta=delay)

        msg = ("trial %d: ase=%s learn_GT=%s learn_theta=%s fix=%s "
               "delay=%d prior=%s" % (trial, ase, learn_GT, learn_theta,
                                      fix_beta_sum, delay, use_prior))
        n_it = int(res.n_iter)
        assert n_it == len(ref_trace) + 1, msg
        trace = np.asarray(res.elbo_trace)[:n_it]
        np.testing.assert_allclose(trace[:len(ref_trace)], ref_trace,
                                   rtol=1e-8, err_msg=msg)
        np.testing.assert_allclose(
            float(res.elbo_ref), ref_trace[-1], rtol=1e-9, err_msg=msg)
        np.testing.assert_allclose(
            np.asarray(res.state.id_prob), ref_model.ID_prob,
            rtol=1e-7, atol=1e-10, err_msg=msg)
        np.testing.assert_allclose(
            np.asarray(res.state.gt_prob), ref_model.GT_prob,
            rtol=1e-7, atol=1e-10, err_msg=msg)
        np.testing.assert_allclose(
            np.asarray(res.state.beta_mu), ref_model.beta_mu,
            rtol=1e-8, err_msg=msg)
