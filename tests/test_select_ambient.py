"""Variant selection and ambient-RNA model parity."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.ops.counts import dense_counts
from vireo_tpu.models.variant_select import (variant_select,
                                             variant_ELBO_gain,
                                             barcode_entropy)


def test_barcode_entropy_parity(reference):
    import sys
    sys.path.insert(0, "/root/reference")
    from vireoSNP.utils.variant_select import barcode_entropy as ref_be
    X = ["#", "#", "#"]
    y = np.array([0, 1, 1])
    e1, b1 = barcode_entropy(X, y)
    e2, b2 = ref_be(X, y)
    assert abs(e1 - e2) < 1e-12
    assert b1 == b2


def test_variant_select_parity(reference):
    import sys
    sys.path.insert(0, "/root/reference")
    from vireoSNP.utils.variant_select import variant_select as ref_vs

    rng = np.random.RandomState(3)
    GT = rng.randint(0, 3, size=(50, 4))
    counts = rng.poisson(30, size=50).astype(float)

    e_ref, b_ref, v_ref = ref_vs(GT, counts, rand_seed=1)
    e_our, b_our, v_our = variant_select(GT, counts, rand_seed=1)
    assert abs(e_ref - e_our) < 1e-12
    assert v_ref == v_our
    assert b_ref == b_our


def test_variant_elbo_gain_parity(small_data, reference):
    import sys
    sys.path.insert(0, "/root/reference")
    from vireoSNP.utils.variant_select import variant_ELBO_gain as ref_gain

    AD, DP, _ = small_data
    rng = np.random.RandomState(5)
    ID_prob = rng.dirichlet([1] * 3, size=AD.shape[1])
    ref = ref_gain(ID_prob, AD.tocsc(), DP.tocsc())
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    ours = np.asarray(variant_ELBO_gain(counts, ID_prob))
    np.testing.assert_allclose(ours, ref.reshape(-1), rtol=1e-8)


def test_ambient_em_against_reference(small_data, reference):
    """Compare the vmapped per-cell EM against the reference cell EM
    with identical psi inits."""
    import sys
    sys.path.insert(0, "/root/reference")
    from vireoSNP.utils.vireo_doublet import _fit_EM_ambient

    AD, DP, _ = small_data
    ADd, DPd = AD.toarray(), DP.toarray()
    rng = np.random.RandomState(0)
    K = 3
    theta_mat = np.clip(rng.rand(AD.shape[0], K), 0.05, 0.95)

    from vireo_tpu.models.ambient import fit_em_ambient_batch

    n_cells_test = 5
    psi0 = rng.dirichlet([1.0] * K, size=n_cells_test)

    # reference is stochastic (dirichlet init inside); monkeypatch init
    ref_psis, ref_llrs = [], []
    for i in range(n_cells_test):
        old = np.random.dirichlet
        np.random.dirichlet = lambda a, _p=psi0[i]: _p.copy()
        try:
            psi, var_cr, llr = _fit_EM_ambient(
                ADd[:, i], DPd[:, i], theta_mat)
        finally:
            np.random.dirichlet = old
        ref_psis.append(psi)
        ref_llrs.append(llr)

    Psi, Var, Llr = fit_em_ambient_batch(
        jnp.asarray(ADd[:, :n_cells_test].T, jnp.float64),
        jnp.asarray(DPd[:, :n_cells_test].T, jnp.float64),
        jnp.asarray(theta_mat, jnp.float64),
        jnp.asarray(psi0, jnp.float64))

    np.testing.assert_allclose(np.asarray(Psi), np.array(ref_psis),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Llr), np.array(ref_llrs),
                               rtol=1e-4, atol=1e-6)


def test_k_sweep_recovers_true_donor_count():
    """BASELINE config "K=2..8 ELBO model selection + donor_match":
    sweep_n_donor picks the simulated K=4 and the K=4 fit aligns to the
    true donors via optimal_match with high accuracy."""
    import jax.numpy as jnp
    from vireo_tpu.engine.select import sweep_n_donor
    from vireo_tpu.engine.wrap import vireo_wrap
    from vireo_tpu.ops.matching import optimal_match
    from vireo_tpu.sim.synth import synth_pool_counts

    pool = synth_pool_counts(n_var=500, n_cell=400, n_donor=4,
                             density=0.25, mean_extra_depth=1.0, seed=11)
    sweep = sweep_n_donor(pool["AD"], pool["DP"],
                          n_donor_list=(2, 3, 4, 5, 6), n_init=4,
                          max_iter_init=30, random_seed=1,
                          dtype=jnp.float32, verbose=False)
    assert sweep["best"] == 4

    res = vireo_wrap(pool["AD"], pool["DP"], n_donor=4, learn_GT=True,
                     n_init=4, random_seed=1, check_doublet=True,
                     dtype=jnp.float32, verbose=False, mesh=None)
    truth = pool["donor"]
    _, perm = optimal_match(np.eye(4)[truth], res["ID_prob"], axis=1)
    acc = (np.argmax(res["ID_prob"][:, perm], 1) == truth).mean()
    assert acc > 0.95


def test_ambient_chunked_cols_matches_batch():
    """The chunked column-reading EM (_ambient_em_cols, the north-star
    path) produces the same psi/var/LLR as the straight vmapped batch,
    including the overlapped final chunk."""
    import jax.numpy as jnp
    from vireo_tpu.models.ambient import (fit_em_ambient_batch,
                                          _ambient_em_cols)
    rng = np.random.RandomState(0)
    V, C, K, n_sel = 40, 53, 3, 17           # C % chunk != 0 on purpose
    dp = (rng.rand(V, C) < 0.5) * rng.poisson(8, (V, C))
    ad = rng.binomial(dp, 0.4)
    sel = np.sort(rng.choice(V, n_sel, replace=False))
    theta = jnp.asarray(rng.rand(n_sel, K) * 0.9 + 0.05, jnp.float64)
    psi0 = jnp.asarray(rng.dirichlet([1.0] * K, size=C), jnp.float64)

    ad_j = jnp.asarray(ad, jnp.float64)
    dp_j = jnp.asarray(dp, jnp.float64)
    want = fit_em_ambient_batch(ad_j[sel].T, dp_j[sel].T, theta, psi0)
    got = _ambient_em_cols(ad_j, dp_j, jnp.asarray(sel), theta, psi0,
                           cell_chunk=16)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12)

    # int8 storage feeds the same float math
    got8 = _ambient_em_cols(jnp.asarray(ad, jnp.int8),
                            jnp.asarray(dp, jnp.int8),
                            jnp.asarray(sel), theta, psi0,
                            cell_chunk=16)
    for g, w in zip(got8, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12)


def test_k_sweep_batched_init_preserves_seeded_stream():
    """sweep_n_donor routes restarts through the wrap's batched-init
    machinery (one upload per K); the seeded host path must stay
    stream-identical to per-restart init_state draws (VERDICT r4 #5)."""
    import jax
    import jax.numpy as jnp
    from vireo_tpu.engine.select import sweep_n_donor
    from vireo_tpu.models.vireo import (VireoConfig, init_state,
                                        default_priors, fit_vb)
    from vireo_tpu.ops.counts import counts_from_scipy
    from vireo_tpu.sim.synth import synth_pool_counts

    pool = synth_pool_counts(n_var=200, n_cell=150, n_donor=3,
                             density=0.3, mean_extra_depth=1.0, seed=3)
    ks, n_init = (2, 3), 3
    sweep = sweep_n_donor(pool["AD"], pool["DP"], n_donor_list=ks,
                          n_init=n_init, max_iter_init=15,
                          random_seed=9, dtype=jnp.float64,
                          verbose=False)

    # the old per-restart reference path, same stream
    counts = counts_from_scipy(pool["AD"], pool["DP"], dtype=jnp.float64)
    binom = float(jax.device_get(counts.binom_coeff_sum()))
    np.random.seed(9)
    for K in ks:
        cfg = VireoConfig(n_var=counts.n_var, n_cell=counts.n_cell,
                          n_donor=K)
        priors = default_priors(cfg, dtype=jnp.float64)
        states = [init_state(cfg, rng=np.random, dtype=jnp.float64)
                  for _ in range(n_init)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        res = jax.vmap(lambda st: fit_vb(
            counts, st, priors, cfg, max_iter=15, min_iter=5,
            delay_fit_theta=3))(batched)
        want = np.asarray(jax.device_get(res.elbo_ref)) + binom
        np.testing.assert_array_equal(sweep[K], want)


def test_k_sweep_unseeded_uses_device_init(monkeypatch):
    """Unseeded sweeps draw restart inits on device (no host upload);
    forcing the knob on with a seed still works and is deterministic."""
    import jax.numpy as jnp
    from vireo_tpu.engine import select as sel
    from vireo_tpu.engine import wrap as wrapmod
    from vireo_tpu.sim.synth import synth_pool_counts

    pool = synth_pool_counts(n_var=200, n_cell=150, n_donor=3,
                             density=0.3, mean_extra_depth=1.0, seed=3)

    called = dict(host=0, dev=0)
    orig_host = wrapmod._host_batched_init
    orig_dev = wrapmod._device_batched_init

    def host(*a, **k):
        called["host"] += 1
        return orig_host(*a, **k)

    def dev(*a, **k):
        called["dev"] += 1
        return orig_dev(*a, **k)

    monkeypatch.setattr(wrapmod, "_host_batched_init", host)
    monkeypatch.setattr(wrapmod, "_device_batched_init", dev)
    sel.sweep_n_donor(pool["AD"], pool["DP"], n_donor_list=(2, 3),
                      n_init=2, max_iter_init=10, dtype=jnp.float32,
                      verbose=False)
    assert called == {"host": 0, "dev": 2}

    monkeypatch.setenv("VIREO_DEVICE_INIT", "1")
    a = sel.sweep_n_donor(pool["AD"], pool["DP"], n_donor_list=(2,),
                          n_init=2, max_iter_init=10, random_seed=4,
                          dtype=jnp.float32, verbose=False)
    b = sel.sweep_n_donor(pool["AD"], pool["DP"], n_donor_list=(2,),
                          n_init=2, max_iter_init=10, random_seed=4,
                          dtype=jnp.float32, verbose=False)
    np.testing.assert_array_equal(a[2], b[2])


def test_ambient_min_gain_knob(small_data, capsys):
    """vireo_wrap(ambient_min_gain=...) overrides the reference-parity
    sqrt(n_cell)/3 SNP gate (exposed on the CLI as --ambientMinGain);
    a high gate selects fewer SNPs, the default reproduces the
    reference formula."""
    import jax.numpy as jnp
    from vireo_tpu.engine.wrap import vireo_wrap

    AD, DP, _ = small_data
    kw = dict(n_donor=3, learn_GT=True, n_init=2, random_seed=3,
              check_doublet=False, check_ambient=True,
              dtype=jnp.float64, verbose=False)

    res_def = vireo_wrap(AD, DP, **kw)
    out_def = capsys.readouterr().out
    want_gate = np.sqrt(AD.shape[1]) / 3.0
    assert ("ELBO_gain > %.1f" % want_gate) in out_def
    assert res_def["ambient_Psi"] is not None

    res_hi = vireo_wrap(AD, DP, ambient_min_gain=1e9, **kw)
    out_hi = capsys.readouterr().out
    assert "0 out %d SNPs" % AD.shape[0] in out_hi
    assert res_hi["ambient_Psi"] is not None

    import argparse
    from vireo_tpu.cli.vireo_cli import build_parser
    ns = build_parser().parse_args(
        ["-c", "x", "-N", "2", "--ambientMinGain", "12.5"])
    assert ns.ambient_min_gain == 12.5
