"""Cell-sharded EM over a virtual 8-device mesh vs single-device fit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vireo_tpu.ops.counts import dense_counts
from vireo_tpu.models.vireo import (VireoConfig, init_state, default_priors,
                                    fit_vb)
from vireo_tpu.parallel.mesh import (make_mesh, build_cell_sharded_coo,
                                     sharded_fit_vb, fit_vb_auto)

N_DEV = 8


@pytest.fixture()
def sharded_setup(small_data):
    AD, DP, _ = small_data
    arrays, meta = build_cell_sharded_coo(AD, DP, n_shards=N_DEV,
                                          dtype=np.float64, pad_multiple=32)
    cfg = VireoConfig(n_var=meta["n_var"], n_cell=meta["n_cell_pad"],
                      n_donor=3)
    rng = np.random.RandomState(2)
    state = init_state(cfg, rng=rng, dtype=jnp.float64)
    priors = default_priors(cfg, dtype=jnp.float64)
    return AD, DP, arrays, meta, cfg, state, priors


def test_sharded_matches_single_device(sharded_setup):
    AD, DP, arrays, meta, cfg, state, priors = sharded_setup
    mesh = make_mesh(N_DEV)

    res_sh = sharded_fit_vb(mesh, arrays, meta, state, priors, cfg,
                            max_iter=15, min_iter=3)

    n_cell = AD.shape[1]
    cfg1 = VireoConfig(n_var=AD.shape[0], n_cell=n_cell, n_donor=3)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    state1 = init_state(
        cfg1, ID_prob_init=np.asarray(state.id_prob)[:n_cell],
        GT_prob_init=np.asarray(state.gt_prob), dtype=jnp.float64)
    res_1 = fit_vb(counts, state1, priors, cfg1, max_iter=15, min_iter=3)

    np.testing.assert_allclose(float(res_sh.elbo_final),
                               float(res_1.elbo_final), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res_sh.state.id_prob)[:n_cell],
        np.asarray(res_1.state.id_prob), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res_sh.state.gt_prob),
                               np.asarray(res_1.state.gt_prob),
                               rtol=1e-7, atol=1e-10)
    assert int(res_sh.n_iter) == int(res_1.n_iter)


def test_auto_sharded_dense(small_data):
    AD, DP, _ = small_data
    n_cell = AD.shape[1]
    mesh = make_mesh(N_DEV)
    cfg = VireoConfig(n_var=AD.shape[0], n_cell=n_cell, n_donor=3)
    counts = dense_counts(AD, DP, dtype=jnp.float64)
    rng = np.random.RandomState(2)
    state = init_state(cfg, rng=rng, dtype=jnp.float64)
    priors = default_priors(cfg, dtype=jnp.float64)

    res_a = fit_vb_auto(mesh, counts, state, priors, cfg, max_iter=15,
                        min_iter=3)
    res_1 = fit_vb(counts, state, priors, cfg, max_iter=15, min_iter=3)
    np.testing.assert_allclose(float(res_a.elbo_final),
                               float(res_1.elbo_final), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_a.state.id_prob),
                               np.asarray(res_1.state.id_prob),
                               rtol=1e-7, atol=1e-10)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(N_DEV)
