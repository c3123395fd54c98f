"""Gelman-Rubin convergence diagnostics.

The reference's grtest/grexit capability (reference: SURVEY.md section
2.3; demo cfg grtest/grexit True): potential scale reduction factor
computed across chains on the second half of the samples.

Two statistics:

* ``gelman_rubin`` — the classic PSRF the reference's MC3 computes
  (matching its grtest semantics).
* ``split_rhat_rank`` — rank-normalized split-R-hat (Vehtari,
  Gelman, Simpson, Carpenter & Buerkner 2021, "Rank-normalization,
  folding, and localization: an improved R-hat"): each chain is split
  in half (detects within-chain trends the classic statistic misses),
  draws are replaced by normal scores of their pooled ranks (robust to
  heavy tails and prior-plateau directions where variances are
  ill-behaved), and the max of the rank-normalized statistic on the
  draws and on the folded draws |x - median| (which detects scale
  mis-mixing) is reported.
"""

from __future__ import annotations

import numpy as np

__all__ = ["gelman_rubin", "split_rhat_rank"]


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


def _rhat_basic(x: np.ndarray) -> np.ndarray:
    """Classic R-hat on [nchain, n, nfree] (no further splitting)."""
    nchain, n, nfree = x.shape
    mean_c = x.mean(axis=1)
    var_c = x.var(axis=1, ddof=1)
    W = var_c.mean(axis=0)
    B_over_n = mean_c.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * W + B_over_n
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / W)
    return np.where(W > 0, rhat, 1.0)


def _rank_normalize(x: np.ndarray) -> np.ndarray:
    """Pooled fractional ranks -> normal scores, per parameter.

    x [nchain, n, nfree] -> z of the same shape, where
    z = ndtri((rank - 3/8) / (N + 1/4))  (Blom offsets, as in the
    Vehtari et al. 2021 recommendation).
    """
    from scipy.special import ndtri

    nchain, n, nfree = x.shape
    N = nchain * n
    z = np.empty_like(x, dtype=np.float64)
    flat = x.reshape(N, nfree)
    order = np.argsort(flat, axis=0, kind="stable")
    ranks = np.empty_like(order)
    rows = np.arange(N)[:, None]
    np.put_along_axis(ranks, order, np.broadcast_to(rows, (N, nfree)), 0)
    z_flat = ndtri((ranks + 1 - 0.375) / (N + 0.25))
    z[...] = z_flat.reshape(nchain, n, nfree)
    return z


def split_rhat_rank(chains: np.ndarray) -> np.ndarray:
    """Rank-normalized split-R-hat per parameter (Vehtari et al. 2021).

    ``chains`` [nchain, niter, nfree] — the draws to diagnose (pass the
    post-burn-in part; this function does NOT discard a warmup half,
    unlike ``gelman_rubin``, but it DOES split each chain in half).
    Returns max(bulk, tail-folded) statistic per parameter; < 1.01 is
    the published convergence recommendation.
    """
    chains = np.asarray(chains, np.float64)
    nchain, niter, nfree = chains.shape
    half = niter // 2
    if half < 2 or nchain < 1:
        return np.full(nfree, np.inf)
    # split each chain in half -> 2*nchain chains of length half
    x = np.concatenate(
        [chains[:, :half, :], chains[:, niter - half:, :]], axis=0)

    bulk = _rhat_basic(_rank_normalize(x))
    med = np.median(x.reshape(-1, nfree), axis=0)
    folded = np.abs(x - med)
    tail = _rhat_basic(_rank_normalize(folded))
    return np.maximum(bulk, tail)
