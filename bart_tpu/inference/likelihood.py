"""Likelihood, parameter freezing/sharing, priors.

Equivalent of MC3's chi-square machinery (reference: SURVEY.md section
2.3 — chisq.c, chisqscale, leastsq, params/pmin/pmax/stepsize
semantics from the demo cfg).  The reference's in-band rejection
sentinels (-ones gather, code/BARTfunc.py:329) become loglike=-inf.

Stepsize semantics (MC3-compatible):
  > 0   free parameter (value = initial proposal scale for MRW)
  == 0  fixed at its initial value
  < 0   shared: copies free parameter at index (-stepsize - 1)
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["ParamSpace", "Likelihood"]


@dataclasses.dataclass
class ParamSpace:
    """Maps the free-parameter subspace to the full model vector."""

    pinit: np.ndarray     # [npars] initial values
    pmin: np.ndarray      # [npars]
    pmax: np.ndarray      # [npars]
    stepsize: np.ndarray  # [npars]
    pnames: list[str] | None = None

    def __post_init__(self):
        self.pinit = np.asarray(self.pinit, np.float64)
        self.pmin = np.asarray(self.pmin, np.float64)
        self.pmax = np.asarray(self.pmax, np.float64)
        self.stepsize = np.asarray(self.stepsize, np.float64)
        self.ifree = np.where(self.stepsize > 0)[0]
        self.ishare = np.where(self.stepsize < 0)[0]
        self.nfree = len(self.ifree)
        self.npars = len(self.pinit)

    def expand(self, free: jax.Array) -> jax.Array:
        """free[..., nfree] -> full[..., npars] (fixed + shared filled;
        reference bestFit.get_params semantics, code/bestFit.py:95-108)."""
        full = jnp.broadcast_to(
            jnp.asarray(self.pinit, free.dtype), free.shape[:-1] + (self.npars,)
        )
        full = full.at[..., self.ifree].set(free)
        for j in self.ishare:
            src = int(-self.stepsize[j]) - 1
            full = full.at[..., j].set(full[..., src])
        return full

    @property
    def free_min(self) -> np.ndarray:
        return self.pmin[self.ifree]

    @property
    def free_max(self) -> np.ndarray:
        return self.pmax[self.ifree]

    @property
    def free_init(self) -> np.ndarray:
        return self.pinit[self.ifree]


class Likelihood:
    """log L(free) = -chi2/2 with bounds, validity, and optional
    Gaussian priors (MC3 prior/priorlow/priorup capability)."""

    def __init__(
        self,
        forward,                      # ForwardModel (or any fn params->(model, _, valid))
        space: ParamSpace,
        data: np.ndarray,
        uncert: np.ndarray,
        prior: np.ndarray | None = None,
        priorlow: np.ndarray | None = None,
        priorup: np.ndarray | None = None,
        wlike: bool = False,
    ):
        self.forward = forward
        self.space = space
        self.data = jnp.asarray(data)
        self.uncert = jnp.asarray(uncert)
        self.prior = prior
        self.priorlow = priorlow
        self.priorup = priorup
        # MC3 ``wlike`` mode (SURVEY.md 2.3, dwt.c): the LAST THREE
        # entries of the full parameter vector are the wavelet noise
        # parameters (gamma, sigma_r, sigma_w); the forward model gets
        # the rest, and the likelihood is Carter & Winn (2009) instead
        # of chi^2.
        self.wlike = wlike

    @property
    def tables(self):
        """The forward model's device-array pytree (None for generic
        callables).  Passed through the sampler's jit as an ARGUMENT so
        committed shardings drive XLA's SPMD partitioner — a pytree
        captured by closure is embedded as replicated per-device HLO
        constants instead, silently losing the wn sharding (and its
        memory savings) in the compiled hot loop."""
        return getattr(self.forward, "tables", None)

    def __call__(self, free: jax.Array, tables: dict | None = None):
        """-> (loglike scalar, model[nfilt]).  vmap over leading axes."""
        full = self.space.expand(free)

        def fwd(p):
            return (self.forward(p, tables) if tables is not None
                    else self.forward(p))

        if self.wlike:
            from bart_tpu.inference.wavelet import wavelet_loglike

            model, _, valid = fwd(full[..., :-3])
            wl = wavelet_loglike(
                model - self.data, full[..., -3], full[..., -2],
                full[..., -1],
            )
            chi2 = -2.0 * wl
        else:
            model, _, valid = fwd(full)
            resid = (model - self.data) / self.uncert
            chi2 = jnp.sum(resid * resid)

        inb = jnp.all(
            (free >= jnp.asarray(self.space.free_min, free.dtype))
            & (free <= jnp.asarray(self.space.free_max, free.dtype))
        )
        logl = -0.5 * chi2
        if self.prior is not None:
            pr = jnp.asarray(self.prior)[self.space.ifree]
            plo = jnp.asarray(self.priorlow)[self.space.ifree]
            pup = jnp.asarray(self.priorup)[self.space.ifree]
            d = free - pr
            sig = jnp.where(d < 0, plo, pup)
            has = (plo > 0) | (pup > 0)
            logl = logl - 0.5 * jnp.sum(jnp.where(has, (d / sig) ** 2, 0.0))
        logl = jnp.where(valid & inb, logl, -jnp.inf)
        return logl, model

    def chisq(self, free: jax.Array):
        logl, model = self(free)
        return -2.0 * logl
