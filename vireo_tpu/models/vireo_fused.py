"""Single-pass ("fused") Vireo EM for large dense workloads.

Restructures the iteration to carry the sufficient statistics
(S1, SS) instead of ID_prob, so the count matrices are read from HBM
ONCE per iteration (the Pallas kernel in ops/pallas_em.py computes the
cell E-step and the next iteration's statistics on the same resident
block). Produces the exact reference update sequence; matmuls run in
bf16 (throughput mode).

Use for 50k+ cell pools; the unfused f32 path remains the
reproducibility-grade default.
"""

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pallas_em import fused_estep_stats, pad_to
from .vireo import (VireoConfig, VireoState, VireoPriors,
                    updates_from_stats)

__all__ = ["FusedData", "prepare_fused", "fused_em_iteration",
           "run_fused_iters_n", "fused_fit_vb"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedData:
    """Padded int8 dense counts ready for the fused kernel."""
    ad: jax.Array            # (V_pad, C_pad) int8, pads zero
    dp: jax.Array
    n_var: int = dataclasses.field(metadata=dict(static=True))
    n_cell: int = dataclasses.field(metadata=dict(static=True))

    @property
    def v_pad(self):
        return self.ad.shape[0]

    @property
    def c_pad(self):
        return self.ad.shape[1]


def prepare_fused(counts, cell_block=128):
    """Pad a DenseCounts to kernel-friendly shapes (V % 32, C % block)."""
    ad = counts.ad
    dp = counts.dp
    if ad.dtype != jnp.int8:
        ad = jnp.clip(ad, 0, 127).astype(jnp.int8)
        dp = jnp.clip(dp, 0, 127).astype(jnp.int8)
    n_var, n_cell = ad.shape
    ad = pad_to(ad, (32, cell_block))
    dp = pad_to(dp, (32, cell_block))
    return FusedData(ad=ad, dp=dp, n_var=int(n_var), n_cell=int(n_cell))


def _pad_state(state, v_pad, c_pad, cfg):
    """Pad parameter arrays to the kernel's variant/cell padding.

    Padded variants carry uniform GT and zero counts, so they
    contribute nothing to statistics or the ELBO; padded cells see
    zero counts -> posterior == prior -> zero ELBO terms.
    """
    V, K, G = state.gt_prob.shape
    gt = jnp.full((v_pad, K, G), 1.0 / G, state.gt_prob.dtype)
    gt = gt.at[:V].set(state.gt_prob)
    idp = jnp.full((c_pad, K), 1.0 / K, state.id_prob.dtype)
    idp = idp.at[:state.id_prob.shape[0]].set(state.id_prob)
    beta_mu = state.beta_mu
    if cfg.ASE_mode and beta_mu.shape[0] == V:
        beta_mu = jnp.concatenate(
            [beta_mu, jnp.full((v_pad - V, beta_mu.shape[1]), 0.5,
                               beta_mu.dtype)])
        beta_sum = jnp.concatenate(
            [state.beta_sum,
             jnp.full((v_pad - V, state.beta_sum.shape[1]), 50.0,
                      state.beta_sum.dtype)])
    else:
        beta_sum = state.beta_sum
    return VireoState(beta_mu=beta_mu, beta_sum=beta_sum, gt_prob=gt,
                      id_prob=idp)


def _pad_priors(priors, v_pad, cfg, n_var):
    gt_log = priors.gt_log
    if gt_log.shape[0] == n_var and v_pad != n_var:
        K, G = gt_log.shape[1], gt_log.shape[2]
        pad = jnp.full((v_pad - n_var, K, G), np.log(1.0 / G),
                       gt_log.dtype)
        gt_log = jnp.concatenate([gt_log, pad])
    return dataclasses.replace(priors, gt_log=gt_log)


def fused_em_iteration(data, S1, SS, state, priors, cfg, update_theta,
                       cell_block=128, interpret=False):
    """One restructured iteration.

    Consumes (S1, SS) = (AD @ id, DP @ id) from the previous pass,
    applies the theta/GT updates, then runs the fused kernel to produce
    the new (S1, SS), id_prob and ELBO. Sequence-identical to
    em_step (see ops/pallas_em.py docstring).
    """
    beta_mu, beta_sum, gt_prob, (Wfa, Wfd), kl_params = \
        updates_from_stats(S1, SS, state, priors, cfg, update_theta)

    S1n, SSn, id_prob, _, lb_p, kl_id = fused_estep_stats(
        data.ad, data.dp, Wfa.astype(jnp.float32),
        Wfd.astype(jnp.float32),
        priors.id_log.astype(jnp.float32).reshape(1, -1),
        cell_block=cell_block, interpret=interpret)

    elbo = lb_p - kl_id - kl_params
    new_state = VireoState(beta_mu=beta_mu, beta_sum=beta_sum,
                           gt_prob=gt_prob, id_prob=id_prob)
    return S1n, SSn, new_state, elbo


@partial(jax.jit, static_argnames=("cfg", "cell_block", "interpret"))
def run_fused_iters_n(data, state, priors, cfg, n_iters, cell_block=128,
                      interpret=False):
    """Benchmark loop: n fused iterations (traced count), returns
    (state, elbo)."""
    state = _pad_state(state, data.v_pad, data.c_pad, cfg)
    priors = _pad_priors(priors, data.v_pad, cfg, data.n_var)
    cfg_pad = dataclasses.replace(cfg, n_var=data.v_pad,
                                  n_cell=data.c_pad)

    S1, SS = _initial_stats(data, state, cell_block)

    def body(i, carry):
        S1, SS, st, _ = carry
        S1, SS, st, elbo = fused_em_iteration(
            data, S1, SS, st, priors, cfg_pad, True,
            cell_block=cell_block, interpret=interpret)
        return (S1, SS, st, elbo)

    dtype = jnp.float32
    S1, SS, st, elbo = jax.lax.fori_loop(
        0, n_iters, body, (S1, SS, state, jnp.asarray(-jnp.inf, dtype)))
    return st, elbo


def _initial_stats(data, state_padded, cell_block):
    """(S1, SS) for the initial id_prob — one plain dense pass before
    the fused loop takes over."""
    idb = state_padded.id_prob.astype(jnp.bfloat16)
    ad = data.ad.astype(jnp.bfloat16)
    dp = data.dp.astype(jnp.bfloat16)
    S1 = jnp.dot(ad, idb, preferred_element_type=jnp.float32)
    SS = jnp.dot(dp, idb, preferred_element_type=jnp.float32)
    return S1, SS


@partial(jax.jit, static_argnames=("cfg", "max_iter", "min_iter",
                                   "delay_fit_theta", "cell_block",
                                   "interpret"))
def fused_fit_vb(data, state, priors, cfg, max_iter=200, min_iter=5,
                 epsilon_conv=1e-2, delay_fit_theta=0, cell_block=128,
                 interpret=False):
    """Full fused fit with the reference convergence predicate.

    Returns (state, elbo_ref, elbo_final, n_iter) — state posteriors
    are sliced back to the unpadded shapes.
    """
    state_p = _pad_state(state, data.v_pad, data.c_pad, cfg)
    priors_p = _pad_priors(priors, data.v_pad, cfg, data.n_var)
    cfg_pad = dataclasses.replace(cfg, n_var=data.v_pad,
                                  n_cell=data.c_pad)
    S1_0, SS_0 = _initial_stats(data, state_p, cell_block)

    dtype = jnp.float32
    eps = jnp.asarray(epsilon_conv, dtype)
    tiny = jnp.asarray(1e-6, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def cond(carry):
        it, S1, SS, st, prev, curr = carry
        delta = curr - prev
        breaked = ((it - 1 > min_iter) & (delta >= -tiny) & (delta < eps))
        return ~((it >= max_iter) | breaked)

    def body(carry):
        it, S1, SS, st, prev, curr = carry
        S1, SS, st, elbo = fused_em_iteration(
            data, S1, SS, st, priors_p, cfg_pad,
            update_theta=(it >= delay_fit_theta), cell_block=cell_block,
            interpret=interpret)
        return (it + 1, S1, SS, st, curr, elbo)

    it, S1, SS, st, prev, curr = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), S1_0, SS_0, state_p, neg_inf,
                     neg_inf))

    out_state = VireoState(
        beta_mu=st.beta_mu[:1] if not cfg.ASE_mode
        else st.beta_mu[:data.n_var],
        beta_sum=st.beta_sum[:1] if not cfg.ASE_mode
        else st.beta_sum[:data.n_var],
        gt_prob=st.gt_prob[:data.n_var],
        id_prob=st.id_prob[:data.n_cell])
    return out_state, prev, curr, it
