"""Checkpoint/resume for long-running fits.

The reference has no checkpointing (runs are minutes-long; SURVEY §5);
at 100k+ cells with many restarts it becomes worthwhile. State is
small — the posteriors, priors, ELBO trace and the host RNG — so a
single .npz per checkpoint is sufficient and dependency-free; the
orbax-style API (save/restore/latest_step) keeps call sites simple.
"""

import os
import glob

import numpy as np
import jax
import jax.numpy as jnp

from ..models.vireo import VireoState, VireoPriors
from .fetch import host_fetch

__all__ = ["save_state", "load_state", "latest_step", "save_rng",
           "load_rng", "check_fingerprint"]


def _path(ckpt_dir, step):
    return os.path.join(ckpt_dir, "vireo_ckpt_%08d.npz" % step)


def save_state(ckpt_dir, step, state, priors=None, elbo_trace=None,
               extra=None, fingerprint=None):
    """Write a checkpoint atomically (tmp + rename).

    `fingerprint` is a flat dict of run-identifying scalars (shapes,
    n_donor, n_init, seed, ...); `check_fingerprint` refuses to resume
    from a checkpoint whose fingerprint disagrees with the current run,
    so a stale directory from a different dataset cannot silently feed
    wrong state into a shape-compatible rerun.
    """
    # host_fetch: the fit state may be cell-sharded across processes in
    # a jax.distributed run (np.asarray on a non-fully-addressable array
    # raises); every process participates in the allgather but only
    # process 0 writes the file.
    payload = {
        "beta_mu": host_fetch(state.beta_mu),
        "beta_sum": host_fetch(state.beta_sum),
        "gt_prob": host_fetch(state.gt_prob),
        "id_prob": host_fetch(state.id_prob),
    }
    if priors is not None:
        payload.update({
            "prior_theta_s1": host_fetch(priors.theta_s1),
            "prior_theta_s2": host_fetch(priors.theta_s2),
            "prior_id_log": host_fetch(priors.id_log),
            "prior_gt_log": host_fetch(priors.gt_log),
        })
    if elbo_trace is not None:
        payload["elbo_trace"] = host_fetch(elbo_trace)
    for k, v in (extra or {}).items():
        payload["extra_" + k] = host_fetch(v)
    for k, v in (fingerprint or {}).items():
        payload["fp_" + k] = np.asarray(v)

    path = _path(ckpt_dir, step)
    if jax.process_index() != 0:
        return path
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)
    return path


def latest_step(ckpt_dir):
    """Highest checkpoint step in the directory, or None."""
    paths = glob.glob(os.path.join(ckpt_dir, "vireo_ckpt_*.npz"))
    if not paths:
        return None
    return max(int(os.path.basename(p)[11:-4]) for p in paths)


def load_state(ckpt_dir, step=None, dtype=jnp.float32):
    """Load (state, priors_or_None, dict_of_extras) from a checkpoint."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError("no checkpoints in %s" % ckpt_dir)
    with np.load(_path(ckpt_dir, step)) as z:
        state = VireoState(
            beta_mu=jnp.asarray(z["beta_mu"], dtype),
            beta_sum=jnp.asarray(z["beta_sum"], dtype),
            gt_prob=jnp.asarray(z["gt_prob"], dtype),
            id_prob=jnp.asarray(z["id_prob"], dtype))
        priors = None
        if "prior_theta_s1" in z:
            priors = VireoPriors(
                theta_s1=jnp.asarray(z["prior_theta_s1"], dtype),
                theta_s2=jnp.asarray(z["prior_theta_s2"], dtype),
                id_log=jnp.asarray(z["prior_id_log"], dtype),
                gt_log=jnp.asarray(z["prior_gt_log"], dtype))
        extras = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
        if "elbo_trace" in z:
            extras["elbo_trace"] = z["elbo_trace"]
    return state, priors, extras


def check_fingerprint(ckpt_dir, fingerprint, step=None):
    """Compare a run fingerprint against the one stored at `step`
    (default: latest). Raises ValueError on any mismatch; warns when
    the checkpoint predates fingerprinting (nothing to compare)."""
    import warnings
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        return
    with np.load(_path(ckpt_dir, step)) as z:
        stored = {k[3:]: z[k] for k in z.files if k.startswith("fp_")}
    if not stored:
        warnings.warn("[vireo] checkpoint %s has no run fingerprint; "
                      "cannot verify it matches this run's inputs"
                      % ckpt_dir)
        return
    bad = [k for k, v in fingerprint.items()
           if k in stored and not np.array_equal(np.asarray(v), stored[k])]
    if bad:
        detail = ", ".join("%s: run=%r ckpt=%r"
                           % (k, fingerprint[k],
                              stored[k].tolist()) for k in bad)
        raise ValueError(
            "[vireo] checkpoint directory %s was written by a DIFFERENT "
            "run (%s). Refusing to resume — clear the directory or point "
            "--checkpointDir elsewhere." % (ckpt_dir, detail))


def save_rng(ckpt_dir, name="rng_state"):
    """Persist the numpy global RNG (restart-stream reproducibility).

    Process 0 writes; other processes hold the identical host stream
    (all run the same seeded host code), so one copy suffices and a
    shared filesystem sees no concurrent writers."""
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    s = np.random.get_state()
    np.savez(os.path.join(ckpt_dir, name + ".npz"),
             name=np.array(s[0]), keys=s[1], pos=np.array(s[2]),
             has_gauss=np.array(s[3]), cached=np.array(s[4]))


def load_rng(ckpt_dir, name="rng_state"):
    with np.load(os.path.join(ckpt_dir, name + ".npz")) as z:
        np.random.set_state((str(z["name"]), z["keys"], int(z["pos"]),
                             int(z["has_gauss"]), float(z["cached"])))
