"""Discriminatory-variant selection.

Re-implements /root/reference/vireoSNP/utils/variant_select.py:
- `variant_select`: greedy information-gain selection of a minimal SNP
  set whose genotype "barcode" distinguishes all donors. Inherently
  sequential and tiny (host numpy), with the reference's exact
  tie-breaking (seeded random pick among count-median-filtered ties).
- `variant_ELBO_gain`: per-variant evidence gain of a multi-donor vs
  single-donor model — batched device math on the Counts abstraction.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import digamma
from jax.nn import logsumexp

__all__ = ["barcode_entropy", "variant_select", "variant_ELBO_gain"]


def barcode_entropy(X, y=None):
    """Entropy (base 2) of categorical barcode strings
    (variant_select.py:5-19)."""
    if y is None:
        Z_str = [str(x) for x in X]
    elif len(X) == len(y):
        Z_str = [str(X[i]) + str(y[i]) for i in range(len(X))]
    else:
        print("Error: X and y have different length in barcode_entropy.")
        return None, None
    _, cnt = np.unique(Z_str, return_counts=True)
    p = cnt / cnt.sum()
    return float(-(p * np.log2(p)).sum()), Z_str


def variant_select(GT, var_count=None, rand_seed=0):
    """Greedy selection of variants maximizing barcode entropy
    (variant_select.py:22-62). Ties are filtered to counts >= median
    then broken by a seeded random pick, like the reference.
    """
    np.random.seed(rand_seed)

    K = GT.shape[1]
    entropy_now = 0.0
    variant_set = []
    barcode_set = ["#"] * K

    entropy_all = np.zeros(GT.shape[0])
    barcode_all = [barcode_set] * GT.shape[0]
    while True:
        for i in range(GT.shape[0]):
            entropy_all[i], barcode_all[i] = barcode_entropy(
                barcode_set, GT[i, :])
        if np.max(entropy_all) == entropy_now:
            break

        idx = np.where(np.max(entropy_all) == entropy_all)[0]
        if var_count is not None:
            idx = idx[var_count[idx] >= np.median(var_count[idx])]
        print("Randomly select 1 more variants out %d" % len(idx))
        idx_use = idx[np.random.randint(len(idx))]

        variant_set.append(idx_use)
        barcode_set = barcode_all[idx_use]
        entropy_now = entropy_all[idx_use]

    if entropy_now < np.log2(K):
        print("Warning: variant_select can't distinguish all samples.")

    return entropy_now, barcode_set, variant_set


@jax.jit
def variant_ELBO_gain(counts, ID_prob, pseudocount=0.5):
    """ELBO gain of the multi-donor model over a single-donor model per
    variant (variant_select.py:66-106), on the Counts abstraction.

    Jitted so the int8->bf16 operand cast in suff_stats fuses into the
    matmul read instead of materializing matrix-sized copies."""
    ID_prob = jnp.asarray(ID_prob)
    S1, SS = counts.suff_stats(ID_prob)
    s1 = S1 + pseudocount
    s2 = (SS - S1) + pseudocount
    ss = SS + 2 * pseudocount

    elbo2 = logsumexp(s1 * digamma(s1) + s2 * digamma(s2)
                      - ss * digamma(ss), axis=1)

    ad_sum, dp_sum = counts.row_sums()
    m1_s1 = ad_sum + pseudocount
    m1_s2 = (dp_sum - ad_sum) + pseudocount
    m1_ss = dp_sum + 2 * pseudocount
    elbo1 = (m1_s1 * digamma(m1_s1) + m1_s2 * digamma(m1_s2)
             - m1_ss * digamma(m1_ss))

    return elbo2 - elbo1
