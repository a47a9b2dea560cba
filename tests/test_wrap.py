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


def test_checkpoint_resume_reproduces_run(small_data, tmp_path):
    """A run interrupted after any phase and restarted with the same
    arguments reproduces the uninterrupted result exactly (VERDICT
    item 5 done-criterion)."""
    import os
    from vireo_tpu.engine.wrap import vireo_wrap

    AD, DP, _ = small_data
    kw = dict(n_donor=3, learn_GT=True, n_init=4, random_seed=7,
              check_doublet=True, dtype=jnp.float64, verbose=False)

    res_plain = vireo_wrap(AD, DP, **kw)                 # no checkpoints

    ck = str(tmp_path / "ck")
    res_full = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    rng_after_full = np.random.get_state()
    files = sorted(os.listdir(ck))
    assert any("00000000" in f for f in files)           # step 0
    assert any("00000001" in f for f in files)           # step 1

    for key in ("ID_prob", "GT_prob", "doublet_prob", "doublet_LLR"):
        np.testing.assert_array_equal(res_full[key], res_plain[key])

    # "killed" right after the refit phase: resume skips straight to
    # the doublet step and must reproduce everything bitwise
    res_r1 = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    for key in ("ID_prob", "GT_prob", "doublet_prob", "doublet_LLR",
                "LB_doublet", "LB_list"):
        np.testing.assert_array_equal(res_r1[key], res_full[key])

    # "killed" right after the warm phase: drop step 1, resume re-runs
    # the refit with the restored RNG stream
    os.remove(os.path.join(ck, "vireo_ckpt_00000001.npz"))
    res_r0 = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    rng_after_r0 = np.random.get_state()
    for key in ("ID_prob", "GT_prob", "doublet_prob", "doublet_LLR",
                "LB_doublet", "LB_list"):
        np.testing.assert_array_equal(res_r0[key], res_full[key])
    # host RNG ends at the same stream position as the full run
    assert rng_after_full[2] == rng_after_r0[2]
    np.testing.assert_array_equal(rng_after_full[1], rng_after_r0[1])


def test_checkpoint_resume_subset_prior(small_data, tmp_path):
    """Resume across the donor-subset branch (extra refit + RNG draws)
    still reproduces the uninterrupted run."""
    import os
    from vireo_tpu.engine.wrap import vireo_wrap

    AD, DP, _ = small_data
    rng = np.random.RandomState(0)
    GT_prior = rng.dirichlet([1.0] * 3, size=(AD.shape[0], 4))
    kw = dict(n_donor=2, GT_prior=GT_prior, learn_GT=False, n_init=1,
              random_seed=3, check_doublet=True, dtype=jnp.float64,
              verbose=False)

    ck = str(tmp_path / "ck2")
    res_full = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    os.remove(os.path.join(ck, "vireo_ckpt_00000001.npz"))
    res_r0 = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    res_r1 = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    for key in ("ID_prob", "GT_prob", "doublet_prob", "LB_doublet"):
        np.testing.assert_array_equal(res_r0[key], res_full[key])
        np.testing.assert_array_equal(res_r1[key], res_full[key])


def test_checkpoint_fingerprint_refuses_foreign_dir(small_data, tmp_path):
    """Resuming from a checkpoint written by a different run (other
    seed / n_init / data) raises instead of silently loading stale
    state (advisor round-2 finding)."""
    import pytest
    from vireo_tpu.engine.wrap import vireo_wrap

    AD, DP, _ = small_data
    ck = str(tmp_path / "ck3")
    kw = dict(n_donor=3, learn_GT=True, check_doublet=True,
              dtype=jnp.float64, verbose=False)
    vireo_wrap(AD, DP, n_init=4, random_seed=7, checkpoint_dir=ck, **kw)

    with pytest.raises(ValueError, match="DIFFERENT run"):
        vireo_wrap(AD, DP, n_init=4, random_seed=8, checkpoint_dir=ck,
                   **kw)
    with pytest.raises(ValueError, match="DIFFERENT run"):
        vireo_wrap(AD, DP, n_init=5, random_seed=7, checkpoint_dir=ck,
                   **kw)


def test_device_init_runs_and_is_deterministic(small_data, monkeypatch):
    """VIREO_DEVICE_INIT=1 draws restart inits on device (no host
    np.random upload); same seed -> same result, and quality matches
    the host-init path on well-separated data."""
    from vireo_tpu.engine.wrap import vireo_wrap
    AD, DP, donor = small_data

    monkeypatch.setenv("VIREO_DEVICE_INIT", "1")
    r1 = vireo_wrap(AD, DP, n_donor=3, n_init=4, random_seed=7,
                    check_doublet=False, verbose=False, mesh=None)
    r2 = vireo_wrap(AD, DP, n_donor=3, n_init=4, random_seed=7,
                    check_doublet=False, verbose=False, mesh=None)
    np.testing.assert_array_equal(r1["ID_prob"], r2["ID_prob"])
    assert np.isfinite(r1["LB_doublet"])
    # recovered grouping agrees with the planted donors up to relabel
    from vireo_tpu.ops.matching import get_confusion
    pred = np.argmax(r1["ID_prob"], axis=1)
    conf, _, _ = get_confusion(pred, donor)
    assert conf.max(axis=0).sum() / conf.sum() > 0.9


def test_device_init_default_unseeded(small_data, monkeypatch):
    """Unseeded runs default to on-device inits; an explicit seed (or
    VIREO_DEVICE_INIT=0) keeps the reference-parity host np.random
    path (round-4 default change)."""
    import vireo_tpu.engine.wrap as W
    AD, DP, _ = small_data
    hits = []
    orig = W._device_batched_init
    monkeypatch.setattr(
        W, "_device_batched_init",
        lambda *a, **k: (hits.append(1), orig(*a, **k))[1])
    kw = dict(n_donor=3, n_init=2, check_doublet=False, verbose=False,
              mesh=None)

    monkeypatch.delenv("VIREO_DEVICE_INIT", raising=False)
    W.vireo_wrap(AD, DP, **kw)
    assert hits, "unseeded run should use device init"

    hits.clear()
    W.vireo_wrap(AD, DP, random_seed=3, **kw)
    assert not hits, "seeded run must keep the host np.random path"

    hits.clear()
    monkeypatch.setenv("VIREO_DEVICE_INIT", "0")
    W.vireo_wrap(AD, DP, **kw)
    assert not hits, "VIREO_DEVICE_INIT=0 must force the host path"

    # unseeded device inits remain run-to-run random: the key is drawn
    # from the global np stream, not pinned
    monkeypatch.delenv("VIREO_DEVICE_INIT", raising=False)
    seeds = []
    monkeypatch.setattr(
        W, "_device_batched_init",
        lambda cfg, n, seed, gp, dt: (seeds.append(seed),
                                      orig(cfg, n, seed, gp, dt))[1])
    np.random.seed(0)
    W.vireo_wrap(AD, DP, **kw)
    W.vireo_wrap(AD, DP, **kw)
    assert len(seeds) == 2 and seeds[0] != seeds[1]


def test_warm_select_argmax_invariant():
    """The fused warm phase selects by device argmax over RAW f32
    restart ELBOs; the reference selects by host argmax after adding
    the (f64) binomial constant. Adding one constant is monotone and
    preserves exact ties, so the indices always agree — verified over
    random vectors with planted exact ties and near-ties at the f32
    resolution limit."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    for _ in range(200):
        n = rng.randint(2, 40)
        e = (rng.randn(n) * 10 - 1e6).astype(np.float32)
        if rng.rand() < 0.5:                 # plant an exact tie
            i, j = rng.choice(n, 2, replace=False)
            e[j] = e[i]
        if rng.rand() < 0.5:                 # near-tie at f32 ulp
            i, j = rng.choice(n, 2, replace=False)
            e[j] = np.nextafter(e[i], np.float32(np.inf), dtype=np.float32)
        c = float(rng.rand() * 1e7)          # binomial-constant scale
        host = int(np.argmax(e.astype(np.float64) + c))
        dev = int(jnp.argmax(jnp.asarray(e)))
        assert host == dev


def test_host_batched_init_stream_parity():
    """_host_batched_init draws the EXACT np.random stream and values
    of the per-restart init_state + stack path (bit-identical), with
    and without a GT prior, and pads mesh cells with the uniform
    prior without consuming stream."""
    import jax
    import jax.numpy as jnp
    from vireo_tpu.models.vireo import VireoConfig, init_state
    from vireo_tpu.engine.wrap import _host_batched_init

    cfg = VireoConfig(n_var=40, n_cell=30, n_donor=3)
    for prior in (None, np.random.RandomState(9).dirichlet(
            [1.0] * 3, size=(40, 3))):
        np.random.seed(5)
        new = _host_batched_init(cfg, 4, prior, np.random, jnp.float32)
        tail_new = np.random.rand()
        np.random.seed(5)
        states = [init_state(cfg, GT_prob_init=prior, rng=np.random,
                             dtype=jnp.float32) for _ in range(4)]
        old = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        tail_old = np.random.rand()
        assert tail_new == tail_old, "stream positions diverged"
        for f in ("id_prob", "gt_prob", "beta_mu", "beta_sum"):
            np.testing.assert_array_equal(np.asarray(getattr(new, f)),
                                          np.asarray(getattr(old, f)))

    # padded draw: rows beyond n_cell_draw are the uniform prior and
    # the stream equals an unpadded draw
    cfg_pad = VireoConfig(n_var=40, n_cell=32, n_donor=3)
    np.random.seed(7)
    padded = _host_batched_init(cfg_pad, 2, None, np.random, jnp.float32,
                                n_cell_draw=30)
    tail_pad = np.random.rand()
    np.random.seed(7)
    unpadded = _host_batched_init(cfg, 2, None, np.random, jnp.float32)
    assert np.random.rand() == tail_pad
    np.testing.assert_array_equal(np.asarray(padded.id_prob[:, :30]),
                                  np.asarray(unpadded.id_prob))
    np.testing.assert_array_equal(np.asarray(padded.id_prob[:, 30:]),
                                  np.full((2, 2, 3), 1 / 3, np.float32))


def test_checkpoint_resume_with_device_mt_stream(small_data, tmp_path,
                                                 monkeypatch):
    """Checkpoint/resume semantics hold when the seeded init stream
    comes from the device MT19937 generator: the saved host-RNG
    position reflects the (identically advanced) stream, and an
    interrupted run resumes to the exact uninterrupted result."""
    import os
    from vireo_tpu.engine.wrap import vireo_wrap

    AD, DP, _ = small_data
    monkeypatch.setenv("VIREO_DEVICE_MT", "1")
    kw = dict(n_donor=3, learn_GT=True, n_init=3, random_seed=11,
              check_doublet=True, dtype=jnp.float64, verbose=False)

    res_plain = vireo_wrap(AD, DP, **kw)
    ck = str(tmp_path / "ck_mt")
    res_full = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    for key in ("ID_prob", "GT_prob", "doublet_prob", "doublet_LLR"):
        np.testing.assert_array_equal(res_full[key], res_plain[key])

    # killed after the warm phase: resume re-runs refit+doublet from
    # the restored stream position
    os.remove(os.path.join(ck, "vireo_ckpt_00000001.npz"))
    res_r0 = vireo_wrap(AD, DP, checkpoint_dir=ck, **kw)
    for key in ("ID_prob", "GT_prob", "doublet_prob", "doublet_LLR",
                "LB_doublet", "LB_list"):
        np.testing.assert_array_equal(res_r0[key], res_full[key])

    # and the MT path's result equals the host-upload path's
    monkeypatch.setenv("VIREO_DEVICE_MT", "0")
    res_host = vireo_wrap(AD, DP, **kw)
    np.testing.assert_array_equal(res_host["ID_prob"],
                                  res_plain["ID_prob"])
