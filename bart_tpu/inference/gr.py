"""Gelman-Rubin convergence diagnostic.

The reference's grtest/grexit capability (reference: SURVEY.md section
2.3; demo cfg grtest/grexit True): potential scale reduction factor
computed across chains on the second half of the samples.
"""

from __future__ import annotations

import numpy as np

__all__ = ["gelman_rubin"]


def gelman_rubin(chains: np.ndarray) -> np.ndarray:
    """PSRF per parameter.

    ``chains`` has shape [nchain, niter, nfree]; the first half of each
    chain is discarded as burn-in (standard split used by MC3).
    Returns psrf[nfree]; values near 1 indicate convergence.
    """
    chains = np.asarray(chains)
    nchain, niter, nfree = chains.shape
    x = chains[:, niter // 2 :, :]
    n = x.shape[1]
    if n < 2 or nchain < 2:
        return np.full(nfree, np.inf)

    mean_c = x.mean(axis=1)                   # [nchain, nfree]
    var_c = x.var(axis=1, ddof=1)             # within-chain variances
    W = var_c.mean(axis=0)
    B_over_n = mean_c.var(axis=0, ddof=1)     # = B/n
    var_plus = (n - 1) / n * W + B_over_n
    with np.errstate(divide="ignore", invalid="ignore"):
        psrf = np.sqrt((var_plus + B_over_n / nchain) / W)
    return np.where(W > 0, psrf, 1.0)
