"""Bulk-sample donor deconvolution: EM over donor fractions, on device.

Same probabilistic model as the reference `VireoBulk`
(/root/reference/vireoSNP/utils/vireo_bulk.py:8-108) — a multiplexed
bulk sample's alt/total count vectors are a mixture over donors whose
per-variant alt rate is `GT_prob @ theta` — but built on this
framework's substrate instead of a host numpy loop: the whole EM is one
jitted `lax.while_loop` (fixed shapes, no host round-trips per
iteration), sharing the convergence-trace/warning machinery of the
other model families.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["VireoBulk", "LikRatio_test", "fit_bulk_em", "bulk_loglik"]


def _mix_rate(gt_prob, theta, psi):
    """Per-variant alt-allele rate of the pooled sample:
    sum_k psi_k * sum_g GT[v,k,g] * theta_g."""
    return jnp.einsum("vkg,g,k->v", gt_prob, theta, psi)


def bulk_loglik(ad, bd, gt_prob, theta, psi):
    """Binomial log-likelihood of the bulk counts under (theta, psi)."""
    rate = _mix_rate(gt_prob, theta, psi)
    return jnp.sum(ad * jnp.log(rate) + bd * jnp.log(1.0 - rate))


@functools.partial(jax.jit, static_argnames=(
    "max_iter", "min_iter", "learn_theta", "delay_fit_theta"))
def fit_bulk_em(ad, bd, gt_prob, psi, theta, max_iter=200, min_iter=5,
                epsilon_conv=1e-3, learn_theta=True, delay_fit_theta=0):
    """Device EM loop. Returns (psi, theta, n_iter, loglik_trace).

    One iteration: responsibilities of each donor for alt reads
    (weights psi * donor alt-rate) and ref reads (psi * ref-rate),
    count-weighted to a new psi; optionally a per-genotype-category
    theta re-estimate from the same responsibilities; then the
    log-likelihood. The stopping rule replicates the reference
    (vireo_bulk.py:95-104): converged when the gain past min_iter drops
    below epsilon_conv (decreases keep iterating, surfaced as warnings
    host-side from the trace).
    """
    dtype = psi.dtype
    eps = jnp.asarray(epsilon_conv, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def cond(carry):
        it, psi, theta, prev, curr, trace = carry
        their_it = it - 1
        converged = ((their_it > min_iter) & (curr >= prev)
                     & (curr - prev < eps))
        return ~((it >= max_iter) | converged)

    def body(carry):
        it, psi, theta, prev, curr, trace = carry
        donor_rate = jnp.einsum("vkg,g->vk", gt_prob, theta)   # (V, K)
        w_alt = donor_rate * psi
        w_ref = (1.0 - donor_rate) * psi
        r_alt = w_alt / w_alt.sum(axis=1, keepdims=True)       # (V, K)
        r_ref = w_ref / w_ref.sum(axis=1, keepdims=True)

        psi_new = ad @ r_alt + bd @ r_ref
        psi_new = psi_new / psi_new.sum()

        gt_alt = jnp.einsum("vkg,vk->vg", gt_prob, r_alt)      # (V, G)
        gt_ref = jnp.einsum("vkg,vk->vg", gt_prob, r_ref)
        s1 = ad @ gt_alt
        s2 = bd @ gt_ref
        theta_new = jnp.where(
            jnp.asarray(learn_theta) & (it >= delay_fit_theta),
            s1 / (s1 + s2), theta)

        ll = bulk_loglik(ad, bd, gt_prob, theta_new, psi_new)
        return (it + 1, psi_new, theta_new, curr, ll,
                trace.at[it].set(ll))

    trace0 = jnp.full((max_iter,), jnp.nan, dtype)
    carry0 = (jnp.asarray(0), psi, theta, neg_inf, neg_inf, trace0)
    it, psi, theta, _, _, trace = jax.lax.while_loop(cond, body, carry0)
    return psi, theta, it, trace


class VireoBulk:
    """Donor fractional abundance psi in a multiplexed bulk sample,
    given genotype probabilities. API mirrors the reference class
    (vireo_bulk.py:8-117); the EM itself runs jitted on device."""

    def __init__(self, n_donor, n_GT=3, psi_init=None,
                 theta_init=(0.01, 0.5, 0.99), dtype=None):
        self.n_GT = n_GT
        self.n_donor = n_donor
        # full precision when x64 is on (reference parity); f32 on
        # accelerators where f64 is unavailable
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self.psi = np.random.dirichlet([1] * n_donor)
        self.theta = np.random.rand(n_GT)
        if psi_init is not None:
            if n_donor != len(psi_init):
                print("Warning: n_donor != len(psi_init)")
            else:
                self.psi = np.asarray(psi_init, np.float64)
        if theta_init is not None:
            if n_GT != len(theta_init):
                print("Warning: n_GT != len(theta_init)")
            else:
                self.theta = np.asarray(theta_init, np.float64)

    def fit(self, AD, DP, GT_prob, max_iter=200, min_iter=5,
            epsilon_conv=1e-3, learn_theta=True, delay_fit_theta=0,
            model="EM", verbose=False):
        """Run the device EM; keeps the reference's trace bookkeeping
        (logLik = last iteration, logLik_all drops it,
        vireo_bulk.py:106-108) and its decrease / non-convergence
        warnings."""
        ad = jnp.asarray(np.asarray(AD, np.float64), self.dtype)
        dp = jnp.asarray(np.asarray(DP, np.float64), self.dtype)
        gt = jnp.asarray(np.asarray(GT_prob, np.float64), self.dtype)

        psi, theta, it, trace = fit_bulk_em(
            ad, dp - ad, gt,
            jnp.asarray(self.psi, self.dtype),
            jnp.asarray(self.theta, self.dtype),
            max_iter=max_iter, min_iter=min_iter,
            epsilon_conv=epsilon_conv, learn_theta=learn_theta,
            delay_fit_theta=delay_fit_theta)

        self.psi = np.asarray(psi)
        self.theta = np.asarray(theta)
        n_it = int(it)
        trace = np.asarray(trace)
        if verbose:
            from .vireo import warn_from_trace
            warn_from_trace(trace, n_it, max_iter, min_iter, style="bulk")
        self.logLik = trace[n_it - 1]
        self.logLik_all = trace[:max(n_it - 1, 0)]

    def LR_test(self, **kwargs):
        return LikRatio_test(psi=self.psi, theta=self.theta, **kwargs)


def LikRatio_test(psi, psi_null, AD, DP, GT_prob, theta, log=False):
    """Chi-square likelihood-ratio test of a donor-abundance null
    (vireo_bulk.py:120-167): 2*(LL(psi) - LL(psi_null)) on
    len(psi_null)-1 degrees of freedom."""
    from scipy.stats import chi2

    ad = jnp.asarray(np.asarray(AD, np.float64))
    dp = jnp.asarray(np.asarray(DP, np.float64))
    gt = jnp.asarray(np.asarray(GT_prob, np.float64))
    theta = jnp.asarray(np.asarray(theta, np.float64))

    def ll(p):
        return float(bulk_loglik(ad, dp - ad, gt, theta,
                                 jnp.asarray(np.asarray(p, np.float64))))

    LR = 2.0 * (ll(psi) - ll(psi_null))
    df = len(psi_null) - 1
    pval = chi2.logsf(LR, df) if log else chi2.sf(LR, df)
    return LR, pval
