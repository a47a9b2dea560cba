"""Doublet detection: one batched E-step over an expanded donor space.

Re-implements the reference's doublet predictor
(/root/reference/vireoSNP/utils/vireo_doublet.py:11-136) as pure JAX:
the donor axis grows by the C(K,2) donor pairs and the genotype axis by
the C(G,2) genotype combinations; the assignment E-step then runs once
on the expanded tensors with the exact same fused contraction as the
core model.
"""

import dataclasses
import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.math import normalize, softmax_from_loglik, digamma_triplet

__all__ = ["add_doublet_theta", "add_doublet_GT", "predict_doublet"]


def _pair_idx(n):
    return np.array(list(itertools.combinations(range(n), 2)), dtype=np.int32)


@jax.jit
def add_doublet_theta(beta_mu, beta_sum):
    """Doublet allelic-rate categories: mean of the pair's means and the
    geometric mean of concentrations (vireo_doublet.py:85-102)."""
    G = beta_mu.shape[1]
    gi = _pair_idx(G)
    mu_db = (beta_mu[:, gi[:, 0]] + beta_mu[:, gi[:, 1]]) / 2.0
    sum_db = jnp.sqrt(beta_sum[:, gi[:, 0]] * beta_sum[:, gi[:, 1]])
    return (jnp.concatenate([beta_mu, mu_db], axis=-1),
            jnp.concatenate([beta_sum, sum_db], axis=-1))


@jax.jit
def add_doublet_GT(GT_prob):
    """Expanded genotype tensor (n_var, K + C(K,2), G + C(G,2))
    (vireo_doublet.py:105-136).

    Jitted: eagerly, the ~12 tensor ops building the (V, K + C(K,2),
    G + C(G,2)) expansion each dispatch separately — ~10 s of pure
    call latency through a remote-accelerator tunnel at the north
    star vs ~0.3 s compiled."""
    V, K, G = GT_prob.shape
    gi = _pair_idx(G)
    si = _pair_idx(K)
    g1, g2 = gi[:, 0], gi[:, 1]
    s1, s2 = si[:, 0], si[:, 1]

    A = GT_prob[:, s1, :]        # (V, P, G)
    B = GT_prob[:, s2, :]
    same = A * B                 # shared-genotype categories
    cross = A[:, :, g1] * B[:, :, g2] + A[:, :, g2] * B[:, :, g1]
    GT_pairs = normalize(jnp.concatenate([same, cross], axis=2), axis=2)

    GT_singlet = jnp.concatenate(
        [GT_prob, jnp.zeros((V, K, len(gi)), GT_prob.dtype)], axis=2)
    return jnp.concatenate([GT_singlet, GT_pairs], axis=1)


def _doublet_weights(gt_both, beta_mu_both, beta_sum_both):
    """Fold the expanded genotype tensor and theta digammas into the
    two (n_var, K_expanded) weight matrices of the cell E-step."""
    d1, d2, ds = digamma_triplet(beta_mu_both * beta_sum_both,
                                 (1.0 - beta_mu_both) * beta_sum_both)
    Wa = jnp.sum(gt_both * d1[:, None, :], axis=-1)
    Wb = jnp.sum(gt_both * d2[:, None, :], axis=-1)
    Ws = jnp.sum(gt_both * ds[:, None, :], axis=-1)
    return Wa - Wb, Wb - Ws


@jax.jit
def doublet_loglik(counts, gt_both, beta_mu_both, beta_sum_both):
    """(n_cell, K + C(K,2)) assignment log-likelihood over the expanded
    space (vireo_doublet.py:52-62), fused as two weight matrices.

    Jitted: eagerly, the int8->bf16 operand cast inside cell_loglik
    materializes matrix-sized copies (2 x 6 GB at 30k x 100k) instead
    of fusing into the matmul read."""
    Wfa, Wfd = _doublet_weights(gt_both, beta_mu_both, beta_sum_both)
    return counts.cell_loglik(Wfa, Wfd)


@functools.partial(jax.jit, static_argnames=("n_donor",))
def _doublet_posterior(counts, gt_both, beta_mu_both, beta_sum_both,
                       log_prior_row, n_donor):
    """E-step posterior + doublet LLR entirely on device.

    The round-trip variant (fetch the (C, K_exp) loglik, push a
    (C, K_exp) log prior, fetch the softmax) moves ~220 MB over the
    host link at the 100k-cell north star; this fetches only the
    posterior once and the (C,) LLR. The singlet slice comes out of
    the same dispatch (an eager slice pays the tunnel's per-call
    latency)."""
    Wfa, Wfd = _doublet_weights(gt_both, beta_mu_both, beta_sum_both)
    logLik = counts.cell_loglik(Wfa, Wfd)
    post = softmax_from_loglik(logLik, log_prior_row[None, :])
    llr = (jnp.max(logLik[:, n_donor:], axis=1)
           - jnp.max(logLik[:, :n_donor], axis=1))
    return post, llr, post[:, :n_donor]


def _fused_doublet_mode(counts, vobj):
    """Whether the single-pass Pallas path applies. OPT-IN only
    (VIREO_FUSED_DOUBLET=1, or =interpret for CPU tests): measured at
    30k x 100k x 16 on TPU v5e, the XLA-native three-pass path runs the
    doublet phase in 52 ms vs the kernel's 69 ms — the unfused int8
    matmuls are already at the HBM roofline and XLA schedules the
    V-deep transposed contraction better than the hand kernel (see
    benchmarks/RESULTS.md). Requires int8/bf16 dense counts on one
    device with a row-broadcast ID prior."""
    import os
    from ..ops.counts import DenseCounts
    knob = os.environ.get("VIREO_FUSED_DOUBLET", "0").lower()
    if knob in ("0", "off", "no", ""):
        return None
    if knob not in ("1", "on", "yes", "kernel", "interpret"):
        import warnings
        warnings.warn("VIREO_FUSED_DOUBLET=%r is not a valid value "
                      "(use 0/1/interpret); keeping the default XLA "
                      "path" % knob)
        return None
    if not isinstance(counts, DenseCounts):
        return None
    if counts.ad.dtype not in (jnp.int8, jnp.bfloat16):
        return None
    if np.asarray(vobj.priors.id_log).shape[0] != 1:
        return None
    if len(counts.ad.devices()) != 1:
        return None  # pallas_call is not SPMD-partitioned
    if knob == "interpret":
        return "interpret"
    return "kernel"


def fused_doublet_estep(counts, gt_both, mu_both, sum_both,
                        log_prior_both, n_donor, cell_block=128,
                        interpret=False):
    """One Pallas pass producing the expanded-space E-step AND the
    singlet-slice sufficient statistics for the follow-up GT update —
    the host path reads the count matrices six times for the same
    result (loglik pass + update_GT_prob's full em_step); this reads
    them once. See ops/pallas_em.py.

    Returns (S1, SS, ID_prob_both, logLik_ID) with cells unpadded.
    """
    from ..ops.pallas_em import fused_estep_stats, pad_to

    Wfa, Wfd = _doublet_weights(gt_both, mu_both, sum_both)
    V, C = counts.ad.shape
    ad = pad_to(counts.ad, (32, cell_block))
    dp = pad_to(counts.dp, (32, cell_block))
    Wfa = pad_to(Wfa.astype(jnp.float32), (32, 1))
    Wfd = pad_to(Wfd.astype(jnp.float32), (32, 1))

    S1, SS, id_prob, loglik, _, _ = fused_estep_stats(
        ad, dp, Wfa, Wfd,
        jnp.asarray(log_prior_both, jnp.float32).reshape(1, -1),
        cell_block=cell_block, interpret=interpret,
        stats_cols=n_donor)
    return S1[:V], SS[:V], id_prob[:C], loglik[:C]


def predict_doublet(vobj, AD, DP=None, update_GT=True, update_ID=True,
                    doublet_rate_prior=None):
    """Predict doublets from a fitted model (vireo_doublet.py:11-82).

    `vobj` is a fitted `models.vireo.Vireo`; returns
    (prob_doublet, prob_singlet, logLik_ratio) and, like the reference,
    refreshes vobj's ID_prob/GT_prob in place when requested.
    """
    counts = vobj._as_counts(AD, DP)
    K = vobj.n_donor
    n_cell = counts.n_cell

    gt_both = add_doublet_GT(vobj.state.gt_prob)
    mu_both, sum_both = add_doublet_theta(vobj.state.beta_mu,
                                          vobj.state.beta_sum)
    n_pair = gt_both.shape[1] - K

    if doublet_rate_prior is None:
        doublet_rate_prior = min(0.5, n_cell / 100000)

    id_prior_np = np.exp(np.asarray(vobj.priors.id_log))

    fused = _fused_doublet_mode(counts, vobj)
    S1 = SS = device_post = None
    if fused is not None:
        # single HBM pass: E-step + singlet GT stats from the kernel
        prior_row = np.concatenate(
            [id_prior_np[0] * (1 - doublet_rate_prior),
             np.full(n_pair, doublet_rate_prior / n_pair)])
        S1, SS, ID_prob_both, logLik_ID = fused_doublet_estep(
            counts, gt_both, mu_both, sum_both,
            np.log(prior_row), K,
            interpret=(fused == "interpret"))
        ID_prob_both = np.asarray(ID_prob_both)
        logLik_ID = np.asarray(logLik_ID)
        logLik_ratio = (logLik_ID[:, K:].max(axis=1)
                        - logLik_ID[:, :K].max(axis=1))
    elif id_prior_np.shape[0] == 1:
        # row-broadcast prior (the standard configuration): posterior
        # and LLR stay on device, same f64 log -> dtype cast as the
        # matrix path below (bit-identical results)
        prior_row = np.concatenate(
            [id_prior_np[0] * (1 - doublet_rate_prior),
             np.full(n_pair, doublet_rate_prior / n_pair)])
        post, llr, post_singlet = _doublet_posterior(
            counts, gt_both, mu_both, sum_both,
            jnp.asarray(np.log(prior_row), vobj.dtype), K)
        device_post = post_singlet
        from ..utils.fetch import host_fetch
        ID_prob_both = host_fetch(post)
        logLik_ratio = host_fetch(llr)
    else:
        id_prior = np.broadcast_to(id_prior_np, (n_cell, K))
        prior_both = np.concatenate(
            [id_prior * (1 - doublet_rate_prior),
             np.full((n_cell, n_pair), doublet_rate_prior / n_pair)],
            axis=1)
        logLik_ID = np.asarray(
            doublet_loglik(counts, gt_both, mu_both, sum_both))
        ID_prob_both = np.asarray(softmax_from_loglik(
            jnp.asarray(logLik_ID), jnp.asarray(np.log(prior_both),
                                                logLik_ID.dtype)))
        logLik_ratio = (logLik_ID[:, K:].max(axis=1)
                        - logLik_ID[:, :K].max(axis=1))

    if update_ID:
        if device_post is not None:
            # the device singlet slice from the posterior dispatch, in
            # place of re-uploading the host copy (a (C, K) push over
            # the accelerator link)
            vobj.state = dataclasses.replace(vobj.state,
                                             id_prob=device_post)
        else:
            vobj.ID_prob = ID_prob_both[:, :K]
        if update_GT and S1 is not None:
            # GT refresh straight from the kernel's statistics — skips
            # update_GT_prob's full extra pass over the count matrices
            from .vireo import updates_from_stats
            cfg = dataclasses.replace(vobj.config, learn_GT=True,
                                      learn_theta=False)
            _, _, gt_prob, _, _ = updates_from_stats(
                jnp.asarray(S1, vobj.dtype), jnp.asarray(SS, vobj.dtype),
                vobj.state, vobj.priors, cfg, update_theta=False)
            vobj.state = dataclasses.replace(vobj.state, gt_prob=gt_prob)
        elif update_GT:
            vobj.update_GT_prob(counts, None)
    elif update_GT:
        print("For update_GT, please turn on update_ID.")

    return ID_prob_both[:, K:], ID_prob_both[:, :K], logLik_ratio
