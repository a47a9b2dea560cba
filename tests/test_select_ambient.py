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
