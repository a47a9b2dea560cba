"""Bulk-sample donor deconvolution (EM over donor fractions).

Re-implements the reference `VireoBulk`
(/root/reference/vireoSNP/utils/vireo_bulk.py:8-167). Data here are
per-variant count *vectors* (tiny), so this runs host-side in numpy —
there is no TPU-scale compute in this model family.
"""

import numpy as np

__all__ = ["VireoBulk", "LikRatio_test"]


class VireoBulk:
    """Estimate donor fractional abundance psi in a multiplexed bulk
    sample, given genotype probabilities (vireo_bulk.py:8-108)."""

    def __init__(self, n_donor, n_GT=3, psi_init=None,
                 theta_init=[0.01, 0.5, 0.99]):
        self.n_GT = n_GT
        self.n_donor = n_donor
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
        """EM for psi (and optionally theta); converges on the binomial
        log-likelihood (vireo_bulk.py:44-108)."""
        AD = np.asarray(AD, np.float64)
        DP = np.asarray(DP, np.float64)
        GT_prob = np.asarray(GT_prob, np.float64)
        BD = DP - AD

        logLik = np.zeros(max_iter)
        for it in range(max_iter):
            theta_mat = GT_prob @ self.theta           # (n_var, n_donor)
            Z1 = theta_mat * self.psi[None, :]
            Z1 = Z1 / Z1.sum(axis=1, keepdims=True)
            Z0 = (1 - theta_mat) * self.psi[None, :]
            Z0 = Z0 / Z0.sum(axis=1, keepdims=True)

            psi_raw = AD @ Z1 + BD @ Z0
            self.psi = psi_raw / psi_raw.sum()

            if learn_theta and it >= delay_fit_theta:
                theta_s1 = AD @ np.sum(GT_prob * Z1[:, :, None], axis=1)
                theta_s2 = BD @ np.sum(GT_prob * Z0[:, :, None], axis=1)
                self.theta = theta_s1 / (theta_s1 + theta_s2)

            theta_vct = (GT_prob @ self.theta) @ self.psi
            logLik[it] = np.sum(AD * np.log(theta_vct)
                                + BD * np.log(1 - theta_vct))
            if it > min_iter:
                if logLik[it] < logLik[it - 1]:
                    if verbose:
                        print("Warning: logLikelihood decreases!\n")
                elif it == max_iter - 1:
                    if verbose:
                        print("Warning: EM did not converge!\n")
                elif logLik[it] - logLik[it - 1] < epsilon_conv:
                    break

        self.logLik = logLik[it]
        self.logLik_all = logLik[:it]

    def LR_test(self, **kwargs):
        return LikRatio_test(psi=self.psi, theta=self.theta, **kwargs)


def LikRatio_test(psi, psi_null, AD, DP, GT_prob, theta, log=False):
    """Chi-square likelihood-ratio test for a donor-abundance null
    hypothesis (vireo_bulk.py:120-167)."""
    from scipy.stats import chi2

    AD = np.asarray(AD, np.float64)
    DP = np.asarray(DP, np.float64)
    BD = DP - AD
    theta_by_donor = np.asarray(GT_prob, np.float64) @ np.asarray(theta)

    theta_alt = theta_by_donor @ np.asarray(psi)
    logLik_alt = np.sum(AD * np.log(theta_alt)
                        + BD * np.log(1 - theta_alt))
    theta_null = theta_by_donor @ np.asarray(psi_null)
    logLik_null = np.sum(AD * np.log(theta_null)
                         + BD * np.log(1 - theta_null))

    LR = 2 * (logLik_alt - logLik_null)
    df = len(psi_null) - 1
    pval = chi2.logsf(LR, df) if log else chi2.sf(LR, df)
    return LR, pval
