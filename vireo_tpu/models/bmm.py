"""Binomial mixture model (clone reconstruction) — vmapped-restart VB.

Functional re-design of the reference `BinomMixtureVB`
(/root/reference/vireoSNP/utils/bmm_model.py): per-variant-per-cluster
Beta posteriors, no genotype tensor. The reference runs its n_init
restarts serially (bmm_model.py:241-254); here they are a single vmap.
"""

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.math import (softmax_from_loglik, kl_categorical, beta_entropy,
                        digamma_triplet)

__all__ = ["BmmState", "BmmPriors", "bmm_step", "fit_bmm", "BinomMixtureVB"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BmmState:
    beta_mu: jax.Array   # (n_var, n_donor)
    beta_sum: jax.Array  # (n_var, n_donor)
    id_prob: jax.Array   # (n_cell, n_donor)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BmmPriors:
    theta_s1: jax.Array  # (n_var, n_donor)
    theta_s2: jax.Array
    id_log: jax.Array    # (1 or n_cell, n_donor)


def bmm_step(counts, state, priors, fix_beta_sum=False):
    """One coordinate-ascent iteration (bmm_model.py:183-188 order:
    theta update, expected log-lik, ID update, ELBO)."""
    S1, SS = counts.suff_stats(state.id_prob)
    S2 = SS - S1
    t1 = S1 + priors.theta_s1
    t2 = S2 + priors.theta_s2
    beta_mu = t1 / (t1 + t2)
    beta_sum = state.beta_sum if fix_beta_sum else (t1 + t2)
    s1 = beta_mu * beta_sum
    s2 = (1.0 - beta_mu) * beta_sum

    d1, d2, ds = digamma_triplet(s1, s2)
    # E[logLik] = AD.T @ d1 + BD.T @ d2 - DP.T @ ds, folded to two terms
    loglik_id = counts.cell_loglik(d1 - d2, d2 - ds)
    id_prob = softmax_from_loglik(loglik_id, priors.id_log, axis=-1)

    LB_p = jnp.sum(loglik_id * id_prob)
    KL_ID = kl_categorical(id_prob, priors.id_log)
    KL_theta = beta_entropy(s1, s2, priors.theta_s1, priors.theta_s2)
    elbo = LB_p - KL_ID - KL_theta

    return BmmState(beta_mu, beta_sum, id_prob), loglik_id, elbo


@partial(jax.jit, static_argnames=("fix_beta_sum", "max_iter", "min_iter"))
def fit_bmm(counts, state, priors, max_iter=200, min_iter=20,
            epsilon_conv=1e-2, fix_beta_sum=False):
    """VB loop with the reference convergence predicate
    (bmm_model.py:178-201), same drop-last ELBO bookkeeping as the core
    model. Returns (state, elbo_ref, elbo_final, n_iter, trace)."""
    dtype = state.id_prob.dtype
    eps = jnp.asarray(epsilon_conv, dtype)
    tiny = jnp.asarray(1e-6, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def cond(carry):
        it, st, prev, curr, trace = carry
        delta = curr - prev
        breaked = ((it - 1 > min_iter) & (delta >= -tiny) & (delta < eps))
        return ~((it >= max_iter) | breaked)

    def body(carry):
        it, st, prev, curr, trace = carry
        st2, _, elbo = bmm_step(counts, st, priors,
                                fix_beta_sum=fix_beta_sum)
        trace = trace.at[it].set(elbo)
        return (it + 1, st2, curr, elbo, trace)

    trace0 = jnp.full((max_iter,), jnp.nan, dtype)
    it, st, prev, curr, trace = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), state, neg_inf, neg_inf, trace0))
    return st, prev, curr, it, trace


class BinomMixtureVB:
    """OO wrapper mirroring the reference class API (bmm_model.py:9-263).

    `fit` runs all n_init random restarts as one vmapped device call,
    keeps the best by final ELBO, and refits it to full convergence.
    """

    def __init__(self, n_cell, n_var, n_donor, fix_beta_sum=False,
                 beta_mu_init=None, beta_sum_init=None, ID_prob_init=None,
                 dtype=jnp.float32):
        self.n_var = n_var
        self.n_cell = n_cell
        self.n_donor = n_donor
        self.fix_beta_sum = fix_beta_sum
        self.beta_mu_init = beta_mu_init
        self.beta_sum_init = beta_sum_init
        self.ID_prob_init = ID_prob_init
        self.dtype = dtype
        self.set_prior()
        self.set_initial(beta_mu_init, beta_sum_init, ID_prob_init)

    def set_initial(self, beta_mu_init=None, beta_sum_init=None,
                    ID_prob_init=None, rng=None):
        """Defaults per bmm_model.py:65-85: beta_mu=0.5, beta_sum=30,
        ID_prob random."""
        if rng is None:
            rng = np.random
        beta_mu = (np.ones((self.n_var, self.n_donor)) * 0.5
                   if beta_mu_init is None else np.asarray(beta_mu_init))
        beta_sum = (np.ones(beta_mu.shape) * 30.0
                    if beta_sum_init is None else np.asarray(beta_sum_init))
        if ID_prob_init is None:
            id_prob = rng.rand(self.n_cell, self.n_donor)
        else:
            id_prob = np.asarray(ID_prob_init, np.float64)
        id_prob = id_prob / id_prob.sum(1, keepdims=True)
        self.state = BmmState(jnp.asarray(beta_mu, self.dtype),
                              jnp.asarray(beta_sum, self.dtype),
                              jnp.asarray(id_prob, self.dtype))
        self.ELBO_iters = np.array([])

    def set_prior(self, ID_prior=None, beta_mu_prior=None,
                  beta_sum_prior=None):
        """Defaults per bmm_model.py:87-105: Beta(0.5*2, 0.5*2) ~ mu=.5,
        sum=2; uniform ID prior."""
        if beta_mu_prior is None:
            beta_mu_prior = np.ones((self.n_var, self.n_donor)) * 0.5
        if beta_sum_prior is None:
            beta_sum_prior = np.ones(np.shape(beta_mu_prior)) * 2.0
        beta_mu_prior = np.asarray(beta_mu_prior, np.float64)
        beta_sum_prior = np.asarray(beta_sum_prior, np.float64)
        if ID_prior is not None:
            id_prior = np.asarray(ID_prior, np.float64)
            if id_prior.ndim == 1:
                id_prior = id_prior[None, :]
        else:
            id_prior = np.full((1, self.n_donor), 1.0 / self.n_donor)
        self.priors = BmmPriors(
            jnp.asarray(beta_mu_prior * beta_sum_prior, self.dtype),
            jnp.asarray((1 - beta_mu_prior) * beta_sum_prior, self.dtype),
            jnp.asarray(np.log(id_prior), self.dtype))

    @property
    def beta_mu(self):
        return np.asarray(self.state.beta_mu)

    @property
    def beta_sum(self):
        return np.asarray(self.state.beta_sum)

    @property
    def ID_prob(self):
        return np.asarray(self.state.id_prob)

    @property
    def theta_s1(self):
        return self.beta_mu * self.beta_sum

    @property
    def theta_s2(self):
        return (1 - self.beta_mu) * self.beta_sum

    def _as_counts(self, AD, DP):
        from ..ops.counts import counts_from_scipy, DenseCounts, SparseCounts
        if isinstance(AD, (DenseCounts, SparseCounts)):
            return AD
        return counts_from_scipy(AD, DP, dtype=self.dtype)

    def fit(self, AD, DP, n_init=10, max_iter=200, max_iter_pre=100,
            random_seed=None, min_iter=20, epsilon_conv=1e-2,
            verbose=True, rng=None):
        """Multi-init fit (bmm_model.py:204-263): warm restarts (vmapped
        on device), best-ELBO selection, long refit, binomial-coefficient
        constant added to all reported ELBOs."""
        if random_seed is not None:
            np.random.seed(random_seed)
        if rng is None:
            rng = np.random
        counts = self._as_counts(AD, DP)
        binom_coeff = float(jax.device_get(counts.binom_coeff_sum()))

        # stack restart inits drawn serially (reference RNG order)
        inits = []
        for _ in range(n_init):
            self.set_initial(self.beta_mu_init, self.beta_sum_init,
                             self.ID_prob_init, rng=rng)
            inits.append(self.state)
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *inits)

        fit_v = jax.vmap(
            lambda st: fit_bmm(counts, st, self.priors,
                               max_iter=max_iter_pre, min_iter=min_iter,
                               epsilon_conv=epsilon_conv,
                               fix_beta_sum=self.fix_beta_sum))
        st_all, elbo_ref, elbo_fin, n_it, traces = fit_v(batched)
        elbo_ref = np.asarray(elbo_ref)
        best = int(np.argmax(elbo_ref))
        self.ELBO_inits = elbo_ref + binom_coeff

        if verbose:
            # reference's per-restart runtime self-checks
            # (bmm_model.py:190-199), replayed from the device traces
            from .vireo import warn_from_trace
            traces_np = np.asarray(traces)
            n_it_np = np.asarray(n_it)
            for i in range(n_init):
                warn_from_trace(traces_np[i], n_it_np[i], max_iter_pre,
                                min_iter, style="bmm")

        best_state = jax.tree.map(lambda x: x[best], st_all)
        n_best = int(np.asarray(n_it)[best])
        warm_trace = np.asarray(traces)[best][:max(n_best - 1, 0)]

        st, prev, curr, it2, trace2 = fit_bmm(
            counts, best_state, self.priors, max_iter=max_iter,
            min_iter=min_iter, epsilon_conv=epsilon_conv,
            fix_beta_sum=self.fix_beta_sum)
        self.state = jax.tree.map(jnp.asarray, jax.device_get(st))
        if verbose:
            from .vireo import warn_from_trace
            warn_from_trace(np.asarray(trace2), int(it2), max_iter,
                            min_iter, style="bmm")
        final_trace = np.asarray(trace2)[:max(int(it2) - 1, 0)]
        self.ELBO_iters = np.concatenate([warm_trace, final_trace]) \
            + binom_coeff
        return self
