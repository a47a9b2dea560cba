"""Allele-count matrix abstraction: the TPU-side data substrate.

The reference holds AD/DP as scipy CSC matrices and performs ~6 separate
spMMs per EM iteration (vireo_model.py:165-219). Here every model-side
use of the data is reduced to exactly two fused contractions:

- ``suff_stats(W)``:   (S1, SS) = (AD @ W, DP @ W)       — variant-side
- ``cell_loglik(Wa, Wd)``: AD.T @ Wa + DP.T @ Wd         — cell-side

(The reference's ``BD = DP - AD`` terms fold algebraically into Wa/Wd,
collapsing its 3 transposed spMMs per genotype category into one pass.)

Two interchangeable backends, both registered pytrees so they can be
closed over / donated through jit:

- ``DenseCounts`` — (n_var, n_cell) dense arrays; contractions are MXU
  matmuls. Optimal at demo scale and for moderately dense matrices.
- ``SparseCounts`` — padded COO triplets kept in BOTH row-major and
  col-major order, so each contraction is a gather + one
  ``segment_sum`` with sorted segment ids. Work is O(nnz * K).

Construction happens on host (numpy / scipy); device code never sees
scipy types.
"""

import dataclasses
import math as _pymath

import numpy as np
import jax
import jax.numpy as jnp

from .math import log_binom_coeff

__all__ = [
    "Counts", "DenseCounts", "SparseCounts",
    "dense_counts", "sparse_counts", "counts_from_scipy",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseCounts:
    """Dense AD/DP counts of shape (n_var, n_cell)."""
    ad: jax.Array
    dp: jax.Array

    @property
    def n_var(self):
        return self.ad.shape[0]

    @property
    def n_cell(self):
        return self.ad.shape[1]

    @property
    def _precision(self):
        # On TPU, f32 matmul inputs are truncated to bf16 on the MXU by
        # default; request full precision for f32/f64 counts so device
        # EM trajectories match the CPU reference. bf16/int8 counts keep
        # the fast default path.
        if self.ad.dtype in (jnp.float32, jnp.float64):
            return jax.lax.Precision.HIGHEST
        return None

    def _operand(self, x, like):
        # int8 counts (half the HBM bytes of bf16) are cast to bf16 on
        # the fly; XLA fuses the convert into the matmul read.
        if x.dtype == jnp.int8:
            return x.astype(jnp.bfloat16)
        return x

    def suff_stats(self, W):
        """(AD @ W, DP @ W) for W of shape (n_cell, K) -> two (n_var, K)."""
        acc = W.dtype
        p = self._precision
        ad = self._operand(self.ad, W)
        dp = self._operand(self.dp, W)
        return (jnp.dot(ad, W, preferred_element_type=acc, precision=p),
                jnp.dot(dp, W, preferred_element_type=acc, precision=p))

    def cell_loglik(self, Wa, Wd):
        """AD.T @ Wa + DP.T @ Wd for (n_var, K) weights -> (n_cell, K)."""
        acc = Wa.dtype
        p = self._precision
        ad = self._operand(self.ad, Wa)
        dp = self._operand(self.dp, Wa)
        return (jnp.dot(ad.T, Wa, preferred_element_type=acc, precision=p)
                + jnp.dot(dp.T, Wd, preferred_element_type=acc,
                          precision=p))

    def binom_coeff_sum(self):
        """Sum of log C(DP, AD) over DP>0 entries (vireo_base.py:7-22).

        Chunked + jitted: the elementwise gammaln over a 30k x 100k
        dense matrix would otherwise materialize several matrix-sized
        f32 temporaries when called eagerly (OOM on a 16 GB chip)."""
        return _dense_binom_coeff_sum(self.dp, self.ad)

    def row_sums(self):
        """(AD.sum(axis=1), DP.sum(axis=1)) -> two (n_var,)."""
        return jnp.sum(self.ad, axis=1), jnp.sum(self.dp, axis=1)

    def n_vars_per_cell(self):
        """Number of variants with DP > 0 per cell (vireo.py:191)."""
        return jnp.sum(self.dp > 0, axis=0)

    def cell_slice(self, start, stop):
        return DenseCounts(self.ad[:, start:stop], self.dp[:, start:stop])

    def var_subset(self, idx):
        return DenseCounts(self.ad[idx, :], self.dp[idx, :])

    def densify(self):
        return self


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseCounts:
    """Padded COO counts in dual sort order.

    `*_r` arrays are sorted by (row, col); `*_c` by (col, row). Padding
    entries carry ad = dp = 0 and index 0, so they contribute nothing.
    """
    rows_r: jax.Array
    cols_r: jax.Array
    ad_r: jax.Array
    dp_r: jax.Array
    rows_c: jax.Array
    cols_c: jax.Array
    ad_c: jax.Array
    dp_c: jax.Array
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_var(self):
        return self.shape[0]

    @property
    def n_cell(self):
        return self.shape[1]

    def suff_stats(self, W):
        K = W.shape[1]
        x = jnp.take(W, self.cols_r, axis=0)               # (nnz, K)
        both = jnp.concatenate(
            [self.ad_r[:, None] * x, self.dp_r[:, None] * x], axis=1)
        S = jax.ops.segment_sum(both, self.rows_r,
                                num_segments=self.n_var,
                                indices_are_sorted=True)
        return S[:, :K], S[:, K:]

    def cell_loglik(self, Wa, Wd):
        contrib = (self.ad_c[:, None] * jnp.take(Wa, self.rows_c, axis=0)
                   + self.dp_c[:, None] * jnp.take(Wd, self.rows_c, axis=0))
        return jax.ops.segment_sum(contrib, self.cols_c,
                                   num_segments=self.n_cell,
                                   indices_are_sorted=True)

    def binom_coeff_sum(self):
        return jnp.sum(log_binom_coeff(self.dp_r, self.ad_r))

    def row_sums(self):
        s = jax.ops.segment_sum(
            jnp.stack([self.ad_r, self.dp_r], axis=1), self.rows_r,
            num_segments=self.n_var, indices_are_sorted=True)
        return s[:, 0], s[:, 1]

    def n_vars_per_cell(self):
        return jax.ops.segment_sum(
            (self.dp_c > 0).astype(jnp.int32), self.cols_c,
            num_segments=self.n_cell, indices_are_sorted=True)

    def densify(self, dtype=None):
        """Scatter the COO triplets into dense (n_var, n_cell) arrays on
        device without ever materializing a dense matrix on host.

        `dtype=bfloat16` (counts <= 256 exact) or `int8` (counts clipped
        to 127; half the HBM bytes) build the fast MXU representations.
        """
        dtype = dtype or self.ad_r.dtype
        ad_v, dp_v = self.ad_r, self.dp_r
        if dtype == jnp.int8:
            ad_v = jnp.clip(ad_v, 0, 127)
            dp_v = jnp.clip(dp_v, 0, 127)
        ad = jnp.zeros(self.shape, dtype).at[
            self.rows_r, self.cols_r].add(ad_v.astype(dtype))
        dp = jnp.zeros(self.shape, dtype).at[
            self.rows_r, self.cols_r].add(dp_v.astype(dtype))
        return DenseCounts(ad, dp)


Counts = (DenseCounts, SparseCounts)


@jax.jit
def _dense_binom_coeff_sum(dp, ad, row_chunk=256):
    """sum(log C(dp, ad)) over a large dense matrix without matrix-
    sized temporaries: fori_loop over row blocks via dynamic_slice
    (a flat-reshape approach copies the whole int8 matrix — 3 GB at
    30k x 100k — which alone blew HBM at full scale)."""
    n_var = dp.shape[0]
    row_chunk = min(row_chunk, max(n_var, 1))
    n_full = n_var // row_chunk

    def body(i, tot):
        d = jax.lax.dynamic_slice_in_dim(dp, i * row_chunk, row_chunk, 0)
        a = jax.lax.dynamic_slice_in_dim(ad, i * row_chunk, row_chunk, 0)
        return tot + jnp.sum(log_binom_coeff(d, a))

    acc_dtype = jax.eval_shape(
        log_binom_coeff,
        jax.ShapeDtypeStruct((1,), dp.dtype),
        jax.ShapeDtypeStruct((1,), ad.dtype)).dtype
    total = jnp.zeros((), acc_dtype)
    if n_full:
        total = jax.lax.fori_loop(0, n_full, body, total)
    if n_var - n_full * row_chunk:
        total = total + jnp.sum(
            log_binom_coeff(dp[n_full * row_chunk:],
                            ad[n_full * row_chunk:]))
    return total


def dense_counts(AD, DP, dtype=jnp.float32):
    """Build DenseCounts from numpy / scipy inputs."""
    AD = _to_dense_np(AD)
    DP = _to_dense_np(DP)
    return DenseCounts(jnp.asarray(AD, dtype=dtype), jnp.asarray(DP, dtype=dtype))


def _to_dense_np(X):
    if hasattr(X, "toarray"):
        return np.asarray(X.toarray())
    return np.asarray(X)


def _round_up(n, m):
    return int(_pymath.ceil(max(n, 1) / m) * m)


def sparse_counts(AD, DP, dtype=jnp.float32, pad_multiple=8192):
    """Build SparseCounts over the union nonzero pattern of AD and DP.

    nnz is padded up to a multiple of `pad_multiple` so jit caches are
    reused across datasets of similar size.
    """
    import scipy.sparse as sp
    A = sp.coo_matrix(AD) if not sp.issparse(AD) else AD.tocoo()
    D = sp.coo_matrix(DP) if not sp.issparse(DP) else DP.tocoo()
    assert A.shape == D.shape, "AD and DP shapes differ"
    n_var, n_cell = A.shape

    # union pattern via CSR addition of indicator matrices
    Da = sp.csr_matrix((np.ones_like(A.data), (A.row, A.col)), shape=A.shape)
    Dd = sp.csr_matrix((np.ones_like(D.data), (D.row, D.col)), shape=D.shape)
    U = (Da + Dd).tocoo()
    rows, cols = U.row.astype(np.int64), U.col.astype(np.int64)

    A_csr = sp.csr_matrix(A)
    D_csr = sp.csr_matrix(D)
    ad_vals = np.asarray(A_csr[rows, cols]).reshape(-1)
    dp_vals = np.asarray(D_csr[rows, cols]).reshape(-1)

    nnz = len(rows)
    nnz_pad = _round_up(nnz, pad_multiple)

    def _packed(order):
        r = np.zeros(nnz_pad, np.int32)
        c = np.zeros(nnz_pad, np.int32)
        a = np.zeros(nnz_pad, np.float64)
        d = np.zeros(nnz_pad, np.float64)
        r[:nnz] = rows[order]
        c[:nnz] = cols[order]
        a[:nnz] = ad_vals[order]
        d[:nnz] = dp_vals[order]
        return r, c, a, d

    row_order = np.lexsort((cols, rows))
    col_order = np.lexsort((rows, cols))
    rr, cr, ar, dr = _packed(row_order)
    rc, cc, ac, dc = _packed(col_order)

    return SparseCounts(
        rows_r=jnp.asarray(rr), cols_r=jnp.asarray(cr),
        ad_r=jnp.asarray(ar, dtype=dtype), dp_r=jnp.asarray(dr, dtype=dtype),
        rows_c=jnp.asarray(rc), cols_c=jnp.asarray(cc),
        ad_c=jnp.asarray(ac, dtype=dtype), dp_c=jnp.asarray(dc, dtype=dtype),
        shape=(int(n_var), int(n_cell)), nnz=int(nnz),
    )


def counts_from_scipy(AD, DP, dtype=jnp.float32, max_dense_elems=64_000_000):
    """Pick a backend: dense when the matrix comfortably fits, else COO.

    Mirrors (inverted) the reference's dense->sparse auto-conversion
    heuristic (vireo_wrap.py:29-34): on TPU, small matrices are *faster
    dense* (MXU), large sparse ones use segment-sum.
    """
    import scipy.sparse as sp
    shape = AD.shape
    n_elems = int(shape[0]) * int(shape[1])
    if n_elems <= max_dense_elems:
        return dense_counts(AD, DP, dtype=dtype)
    return sparse_counts(AD, DP, dtype=dtype)
