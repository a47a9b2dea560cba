"""Compatibility alias: `vireo_tpu.base` mirrors `vireoSNP.base`
(= vireoSNP/utils/vireo_base.py) so reference-based scripts port 1:1.
"""

from .ops.math import (normalize, loglik_amplify, beta_entropy,
                       get_binom_coeff)
from .ops.matching import (match, optimal_match, greed_match,
                           donor_select, get_confusion)

import numpy as np
from scipy.special import gammaln


def tensor_normalize(X, axis=1):
    return normalize(X, axis)


def logbincoeff(n, k, is_sparse=False):
    """log [n! / (k! (n-k)!)] via gammaln (vireo_base.py:25-41)."""
    if is_sparse:
        RV_sparse = n.copy() * 0
        idx = (k > 0).multiply(k < n)
        n = np.array(n[idx]).reshape(-1)
        k = np.array(k[idx]).reshape(-1)
    RV = gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)
    if is_sparse:
        RV_sparse[idx] += RV
        RV = RV_sparse
    return RV


