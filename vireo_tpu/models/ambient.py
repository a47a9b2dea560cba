"""Ambient-RNA fraction estimation: per-cell EM, vmapped across cells.

Re-implements the reference's per-cell ambient estimator
(/root/reference/vireoSNP/utils/vireo_doublet.py:139-273). The
reference fans cells out over a multiprocessing.Pool with BLAS pinned
to one thread; here the whole cell batch is one vmapped
`lax.while_loop` on device.

Flagged "still under development" upstream (vireo_doublet.py:214); kept
at feature parity.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fit_em_ambient_batch", "predit_ambient", "predict_ambient"]


def _cell_em(ad, dp, theta_mat, psi0, n_mask, max_iter, min_iter,
             epsilon_conv):
    """EM for one cell's donor-mixture fraction psi
    (vireo_doublet.py:139-210). ad/dp: (n_var,), theta_mat: (n_var, K).

    Integer count rows are cast here, INSIDE the jit, so int8 storage
    feeds the float math without a matrix-sized host-visible copy (the
    convert fuses into each read).
    """
    ad = ad.astype(theta_mat.dtype)
    bd = dp.astype(theta_mat.dtype) - ad
    K = theta_mat.shape[1]
    dtype = theta_mat.dtype
    eps = jnp.asarray(epsilon_conv, dtype)

    def loglik_of(theta_vct):
        safe = jnp.clip(theta_vct, 1e-300, 1.0 - 1e-15)
        return jnp.sum(jnp.where(ad > 0, ad * jnp.log(safe), 0.0)
                       + jnp.where(bd > 0, bd * jnp.log1p(-safe), 0.0))

    def body(carry):
        it, psi, prev, curr = carry
        # donor masking after warm-up (vireo_doublet.py:150-154)
        if n_mask > 0:
            rank = jnp.argsort(jnp.argsort(psi))
            mask = (rank < n_mask) & (it >= min_iter - 3)
        else:
            mask = jnp.zeros((K,), bool)

        Z1 = theta_mat * psi[None, :]
        Z1 = jnp.where(mask[None, :], 0.0, Z1)
        Z1 = Z1 / jnp.sum(Z1, axis=1, keepdims=True)
        Z0 = (1.0 - theta_mat) * psi[None, :]
        Z0 = jnp.where(mask[None, :], 0.0, Z0)
        Z0 = Z0 / jnp.sum(Z0, axis=1, keepdims=True)

        psi_raw = ad @ Z1 + bd @ Z0
        psi = psi_raw / jnp.sum(psi_raw)

        ll = loglik_of(theta_mat @ psi)
        return (it + 1, psi, curr, ll)

    def cond(carry):
        it, psi, prev, curr = carry
        delta = curr - prev
        breaked = (it - 1 > min_iter) & (delta >= 0) & (delta < eps)
        return ~((it >= max_iter) | breaked)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    it, psi, prev, curr = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), psi0, neg_inf, neg_inf))

    # Cramér–Rao variance bound via Fisher information
    # (vireo_doublet.py:184-193)
    theta_vct = (theta_mat @ psi)[:, None]
    fisher = jnp.sum((theta_mat / theta_vct) ** 2 * ad[:, None]
                     + (theta_mat / (1.0 - theta_vct)) ** 2 * bd[:, None],
                     axis=0)
    var_cr = 1.0 / fisher

    # LR against the single-donor null (all mass on argmax psi;
    # vireo_doublet.py:195-206 with min_p=0). Like the reference, the
    # reported fit log-likelihood is logLik[:it][-1] — the second-to-
    # last executed iteration's value (`prev`).
    best = jnp.argmax(psi)
    ll_null = loglik_of(theta_mat[:, best])
    ll_ratio = prev - ll_null

    return psi, var_cr, ll_ratio


@partial(jax.jit, static_argnames=("n_mask", "max_iter", "min_iter",
                                   "cell_chunk"))
def fit_em_ambient_batch(AD_cells, DP_cells, theta_mat, psi0, n_mask=0,
                         max_iter=200, min_iter=20, epsilon_conv=1e-3,
                         cell_chunk=None):
    """Batched per-cell ambient EM.

    AD_cells/DP_cells: (n_cell, n_var) dense slices (any count dtype —
    int8 storage is cast inside the EM); psi0: (n_cell, K).
    Returns (Psi (n_cell, K), Psi_var (n_cell, K), LLR (n_cell,)).

    `cell_chunk` bounds the live batch: the vmapped EM's (chunk,
    n_var, K) temporaries are the memory cost, and at the 100k-cell
    north star with thousands of selected SNPs an unchunked vmap
    allocates tens of GB. Chunks run sequentially (lax.map), cells
    within a chunk in parallel (vmap).
    """
    f = lambda args: _cell_em(args[0], args[1], theta_mat, args[2],
                              n_mask, max_iter, min_iter, epsilon_conv)
    if cell_chunk is None:
        return jax.vmap(lambda a, d, p: _cell_em(
            a, d, theta_mat, p, n_mask, max_iter, min_iter,
            epsilon_conv))(AD_cells, DP_cells, psi0)
    return jax.lax.map(f, (AD_cells, DP_cells, psi0),
                       batch_size=int(cell_chunk))


@partial(jax.jit, static_argnames=("n_mask", "max_iter", "min_iter",
                                   "cell_chunk"))
def _ambient_em_cols(ad_vc, dp_vc, sel, theta_sel, psi0, n_mask=0,
                     max_iter=200, min_iter=20, epsilon_conv=1e-3,
                     cell_chunk=256):
    """Chunked per-cell EM reading the (n_var, n_cell) count storage
    DIRECTLY: each chunk slices its cell columns, gathers the selected
    variant rows, transposes, and runs the vmapped EM — so no
    (n_cell, n_sel) copy of the counts ever exists and the live
    footprint is the chunk's (chunk, n_sel, K) EM temporaries. The
    last chunk overlaps backward instead of padding (recomputed cells
    produce identical values and overwrite in place)."""
    C = ad_vc.shape[1]
    chunk = min(int(cell_chunk), C)
    n_chunks = -(-C // chunk)
    dtype = theta_sel.dtype

    def body(i, out):
        psi_out, var_out, llr_out = out
        lo = jnp.minimum(i * chunk, C - chunk)
        a = jnp.take(jax.lax.dynamic_slice_in_dim(ad_vc, lo, chunk, 1),
                     sel, axis=0).T                       # (chunk, n_sel)
        d = jnp.take(jax.lax.dynamic_slice_in_dim(dp_vc, lo, chunk, 1),
                     sel, axis=0).T
        p = jax.lax.dynamic_slice_in_dim(psi0, lo, chunk, 0)
        psi, var, llr = jax.vmap(lambda av, dv, pv: _cell_em(
            av, dv, theta_sel, pv, n_mask, max_iter, min_iter,
            epsilon_conv))(a, d, p)
        return (jax.lax.dynamic_update_slice_in_dim(psi_out, psi, lo, 0),
                jax.lax.dynamic_update_slice_in_dim(var_out, var, lo, 0),
                jax.lax.dynamic_update_slice_in_dim(llr_out, llr, lo, 0))

    K = theta_sel.shape[1]
    out0 = (jnp.zeros((C, K), dtype), jnp.zeros((C, K), dtype),
            jnp.zeros((C,), dtype))
    return jax.lax.fori_loop(0, n_chunks, body, out0)


def predit_ambient(vobj, AD, DP, nproc=None, min_ELBO_gain=None, rng=None):
    """Predict per-cell ambient-RNA donor fractions
    (vireo_doublet.py:213-273). `nproc` is accepted for API parity and
    ignored — the batch is one device call.
    """
    import timeit
    from .variant_select import variant_ELBO_gain
    start = timeit.default_timer()
    if rng is None:
        rng = np.random

    counts = vobj._as_counts(AD, DP)
    theta_mat = np.tensordot(vobj.GT_prob, vobj.beta_mu[0, :], axes=(2, 0))

    if min_ELBO_gain is None:
        min_ELBO_gain = np.sqrt(counts.n_cell) / 3.0
    gain = variant_ELBO_gain(counts, vobj.ID_prob)
    snp_idx = np.asarray(gain) >= min_ELBO_gain
    print("[vireo] %d out %d SNPs selected for ambient RNA detection: "
          "ELBO_gain > %.1f" % (snp_idx.sum(), len(snp_idx), min_ELBO_gain))

    sel = np.where(snp_idx)[0]
    theta_sel = theta_mat[snp_idx, :]
    K = theta_mat.shape[1]
    psi0 = rng.dirichlet([1.0] * K, size=counts.n_cell)

    from ..ops.counts import DenseCounts
    # would the vmapped EM's (n_cell, n_sel, K) temporaries be large?
    big = counts.n_cell * len(sel) * K * 4 > (1 << 28)
    if isinstance(counts, DenseCounts) and big \
            and counts.ad.is_fully_addressable:
        # north-star path: chunked EM reads the (n_var, n_cell) int8
        # storage in place — no (n_cell, n_sel) copy, bounded
        # temporaries (identical per-cell math to the batch path)
        dtype = np.float64 if counts.ad.dtype == jnp.float64 \
            else np.float32
        chunk = max(64, int((3 << 30) // (6 * len(sel) * K * 4)))
        Psi, Psi_var, Psi_llr = _ambient_em_cols(
            counts.ad, counts.dp, jnp.asarray(sel),
            jnp.asarray(theta_sel, dtype), jnp.asarray(psi0, dtype),
            cell_chunk=chunk)
    else:
        # subset variants BEFORE densifying: the full dense matrix is
        # gigabytes at scale (or, on the hybrid/packed rungs, exceeds
        # the f32 HBM budget outright); the selected-SNP block is small
        base = counts if hasattr(counts, "var_subset") \
            else counts.densify()         # pure-COO fallback layout
        dense = base.var_subset(sel).densify()
        # the per-cell EM is float math; integer count layouts (int8/
        # nibble) must not leak their storage dtype into it
        dtype = np.float64 if dense.ad.dtype == jnp.float64 \
            else np.float32
        if isinstance(dense.ad, jax.Array) \
                and not dense.ad.is_fully_addressable:
            # multi-process run: the selected block is cell-sharded
            # across processes; allgather the small (n_sel, C) block
            # and run the batch locally on every process
            from ..utils.fetch import host_fetch
            ad_cells = jnp.asarray(host_fetch(dense.ad).T, dtype)
            dp_cells = jnp.asarray(host_fetch(dense.dp).T, dtype)
        else:
            # transpose/cast ON DEVICE: a host round-trip here moved
            # hundreds of MB over the accelerator link for values the
            # device already holds
            ad_cells = dense.ad.T.astype(dtype)
            dp_cells = dense.dp.T.astype(dtype)
        Psi, Psi_var, Psi_llr = fit_em_ambient_batch(
            ad_cells, dp_cells,
            jnp.asarray(theta_sel, dtype), jnp.asarray(psi0, dtype))
    # materialize before stopping the clock (dispatch is async; the
    # printed time should cover the actual EM work); host_fetch
    # streams large results concurrently over a slow link
    from ..utils.fetch import host_fetch
    Psi, Psi_var, Psi_llr = (host_fetch(Psi), host_fetch(Psi_var),
                             host_fetch(Psi_llr))

    stop = timeit.default_timer()
    print('[vireo] Ambient RNA time: %.1f sec' % (stop - start))
    return Psi, Psi_var, Psi_llr


# preferred (correctly spelled) alias
predict_ambient = predit_ambient
