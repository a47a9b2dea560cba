"""Model selection: ELBO sweep over the number of donors/clones.

The reference performs this in notebooks (doc/index.rst:52-53, the
vireoSNP_clones example): fit K = 2..N with multiple restarts each and
compare the ELBO distributions. Here the whole sweep is a first-class
API; each K's restarts run as one vmapped device call.
"""


import numpy as np
import jax
import jax.numpy as jnp

from ..ops.counts import counts_from_scipy
from ..models.vireo import VireoConfig, default_priors, fit_vb
from ..models.bmm import BinomMixtureVB

__all__ = ["sweep_n_donor", "sweep_n_clone"]


def sweep_n_donor(AD, DP=None, n_donor_list=(2, 3, 4, 5, 6, 7, 8),
                  n_init=20, max_iter_init=20, delay_fit_theta=3,
                  random_seed=None, dtype=jnp.float32, verbose=True):
    """Genotype-free ELBO sweep over candidate donor counts.

    Returns {K: np.array of per-restart ELBOs} plus "best" — the K
    maximizing the top ELBO. Mirrors the notebook recipe of box-plotting
    `ELBO_inits` across K.

    The data counts are shared across the whole sweep, and each K's
    restart states come from the wrap's batched-init machinery: seeded
    runs assemble the reference-stream np.random draws into ONE host
    array per field (one upload per K); unseeded runs draw on device
    (no init upload at all) — the per-restart host-init/stack pattern
    this replaces paid that upload once per restart per K.
    """
    from .wrap import (_seeded_batched_init, _device_batched_init,
                       _device_init_policy)

    if hasattr(AD, "suff_stats"):       # already a device counts object
        counts = AD
    else:
        counts = counts_from_scipy(AD, DP, dtype=dtype)
    if random_seed is not None:
        np.random.seed(random_seed)
    rng = np.random

    # the wrap's init placement policy: host np.random draws exist
    # only for seeded-stream parity
    device_init = _device_init_policy(random_seed)

    binom = float(jax.device_get(counts.binom_coeff_sum()))
    out = {}
    for K in n_donor_list:
        cfg = VireoConfig(n_var=counts.n_var, n_cell=counts.n_cell,
                          n_donor=int(K))
        priors = default_priors(cfg, dtype=dtype)
        if device_init:
            dseed = random_seed if random_seed is not None \
                else int(rng.randint(2 ** 31))
            batched = _device_batched_init(cfg, n_init, dseed, None,
                                           dtype)
        else:
            batched = _seeded_batched_init(cfg, n_init, None, rng, dtype)
        res = jax.vmap(lambda st: fit_vb(
            counts, st, priors, cfg, max_iter=max_iter_init, min_iter=5,
            delay_fit_theta=delay_fit_theta))(batched)
        out[int(K)] = np.asarray(jax.device_get(res.elbo_ref)) + binom
        if verbose:
            print("[vireo] K=%d ELBO range [%.1f, %.1f, %.1f]"
                  % (K, out[int(K)].min(), np.median(out[int(K)]),
                     out[int(K)].max()))

    out["best"] = int(max(n_donor_list, key=lambda K: out[int(K)].max()))
    return out


def sweep_n_clone(AD, DP, n_clone_list=(2, 3, 4, 5), n_init=50,
                  min_iter=30, random_seed=None, dtype=jnp.float32,
                  verbose=True):
    """Clone-count sweep for the binomial mixture model (the mkn45
    mito notebook workflow). Returns {K: ELBO_inits array, "best": K}.
    """
    out = {}
    for K in n_clone_list:
        model = BinomMixtureVB(n_cell=AD.shape[1], n_var=AD.shape[0],
                               n_donor=int(K), dtype=dtype)
        model.fit(AD, DP, n_init=n_init, min_iter=min_iter,
                  random_seed=random_seed)
        out[int(K)] = np.asarray(model.ELBO_inits)
        if verbose:
            print("[vireo] n_clone=%d ELBO range [%.1f, %.1f, %.1f]"
                  % (K, out[int(K)].min(), np.median(out[int(K)]),
                     out[int(K)].max()))
    out["best"] = int(max(n_clone_list, key=lambda K: out[int(K)].max()))
    return out
