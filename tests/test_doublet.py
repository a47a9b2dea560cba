"""Doublet expansion and prediction parity with the reference."""

import numpy as np
import jax.numpy as jnp

from vireo_tpu.models.doublet import (add_doublet_GT, add_doublet_theta,
                                      predict_doublet)
from vireo_tpu.models.vireo import Vireo


def test_add_doublet_theta_parity(reference):
    from vireoSNP.utils.vireo_doublet import add_doublet_theta as ref_fn
    mu = np.array([[0.01, 0.5, 0.99]])
    s = np.array([[30.0, 6.0, 30.0]])
    mu2, s2 = add_doublet_theta(jnp.asarray(mu), jnp.asarray(s))
    rmu, rs = ref_fn(mu, s)
    np.testing.assert_allclose(np.asarray(mu2), rmu, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s2), rs, rtol=1e-12)


def test_add_doublet_gt_parity(reference):
    from vireoSNP.utils.vireo_doublet import add_doublet_GT as ref_fn
    rng = np.random.RandomState(4)
    GT = rng.dirichlet([1, 1, 1], size=(25, 4))
    ours = np.asarray(add_doublet_GT(jnp.asarray(GT)))
    ref = ref_fn(GT)
    assert ours.shape == ref.shape == (25, 4 + 6, 6)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_predict_doublet_parity(small_data, reference):
    AD, DP, _ = small_data

    np.random.seed(21)
    ref_model = reference.Vireo(n_cell=AD.shape[1], n_var=AD.shape[0],
                                n_donor=3)
    ref_model.set_prior()
    ref_model.fit(AD, DP, max_iter=20, verbose=False)

    np.random.seed(21)
    model = Vireo(n_cell=AD.shape[1], n_var=AD.shape[0], n_donor=3,
                  dtype=jnp.float64)
    model.fit(AD, DP, max_iter=20)

    np.testing.assert_allclose(model.ID_prob, ref_model.ID_prob,
                               rtol=1e-6, atol=1e-10)

    from vireoSNP.utils.vireo_doublet import predict_doublet as ref_pd
    ref_db, ref_sg, ref_llr = ref_pd(ref_model, AD, DP)
    db, sg, llr = predict_doublet(model, AD, DP)

    np.testing.assert_allclose(db, ref_db, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(sg, ref_sg, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(llr, ref_llr, rtol=1e-5, atol=1e-8)
    # both update the model in place: GT_prob refreshed
    np.testing.assert_allclose(model.GT_prob, ref_model.GT_prob,
                               rtol=1e-5, atol=1e-9)
