"""Retrieval orchestration: blocks of on-device MCMC + host-side control.

Equivalent of MC3's mccubed.py driver (reference: SURVEY.md sections
2.3/3.2) with the TPU-native execution model: the chain ensemble
advances in jitted blocks (one device call per ``block`` iterations);
between blocks the host runs the Gelman-Rubin test (grtest/grexit),
accumulates the posterior, streams savemodel outputs, and writes
checkpoints — giving mid-run resume capability the reference lacks
(its chains restart from zero, SURVEY.md section 5).

Outputs are reference-compatible:
* ``output.npy``  posterior tensor [nchain, nfree, niter]
                  (code/bestFit.py:431-433 layout)
* ``MCMC.log``    with a " Best-fit params" block parseable by
                  bestFit.read_MCMC_out (code/bestFit.py:55-92)
* ``savemodel``   band-flux tensor [nchain, nmodel, niter]
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from bart_tpu.inference.gr import gelman_rubin
from bart_tpu.inference.likelihood import Likelihood, ParamSpace
from bart_tpu.inference.samplers import EnsembleSampler, SamplerState

__all__ = ["RetrievalResult", "run_mcmc", "least_squares_prefit",
           "save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: SamplerState, pos_chunks, model_chunks,
                    done_iters: int, key) -> None:
    """Persist the full sampler state mid-run (capability the reference
    lacks: its chains restart from zero, SURVEY.md section 5)."""
    arrays = {f"state/{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays["done_iters"] = np.asarray(done_iters)
    arrays["key"] = jax.random.key_data(key)
    arrays["posterior"] = (
        np.concatenate(pos_chunks, axis=2) if pos_chunks
        else np.zeros((0, 0, 0))
    )
    if model_chunks:
        arrays["models"] = np.concatenate(model_chunks, axis=2)
    np.savez(path, **arrays)


def load_checkpoint(path: str):
    """-> (state, pos_chunks, model_chunks, done_iters, key)."""
    z = np.load(path)
    state = SamplerState(**{
        k.split("/", 1)[1]: jnp.asarray(z[k])
        for k in z.files if k.startswith("state/")
    })
    pos_chunks = [z["posterior"]] if z["posterior"].size else []
    model_chunks = [z["models"]] if "models" in z.files else []
    key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return state, pos_chunks, model_chunks, int(z["done_iters"]), key


@dataclasses.dataclass
class RetrievalResult:
    posterior: np.ndarray      # [nchain, nfree, niter] post burn-in
    models: np.ndarray | None  # [nchain, nmodel, niter] if savemodel
    bestp: np.ndarray          # [nfree]
    best_loglike: float
    accept_rate: float
    psrf: np.ndarray           # final Gelman-Rubin per free param
    pnames: list[str]
    space: ParamSpace
    niter_total: int
    converged: bool


def least_squares_prefit(like: Likelihood, space: ParamSpace):
    """Optional Levenberg-Marquardt pre-fit (the reference's
    leastsq=True via scipy, SURVEY.md 2.3), using JAX gradients."""
    import scipy.optimize as so

    def resid(free):
        logl, model = like(jnp.asarray(free))
        r = np.asarray((model - like.data) / like.uncert)
        return np.where(np.isfinite(r), r, 1e10)

    out = so.least_squares(
        resid, space.free_init,
        bounds=(space.free_min, space.free_max), method="trf",
    )
    return out.x


def run_mcmc(
    like: Likelihood,
    space: ParamSpace,
    *,
    nchains: int = 10,
    numit: int = 50000,
    burnin: int = 500,
    walk: str = "snooker",
    seed: int = 0,
    block: int = 100,
    thinning: int = 1,
    grtest: bool = True,
    grexit: bool = False,
    grbreak: float = 1.01,
    leastsq: bool = False,
    chisqscale: bool = False,
    init: np.ndarray | None = None,
    savefile: str | None = None,
    savemodel: str | None = None,
    modelper: int = 0,
    logfile: str | None = None,
    checkpoint: str | None = None,
    checkpoint_every: int = 20,
    resume: bool = False,
    fgamma: float = 1.0,
    verbose: bool = True,
    dtype=jnp.float64,
) -> RetrievalResult:
    """Run a retrieval.  ``numit`` is the TOTAL number of samples
    across chains (reference numit semantics: demo numit=5e4 with
    nchains=3 -> ~16.7k iterations per chain)."""
    t_start = time.time()
    log_lines: list[str] = []

    def log(msg):
        if verbose:
            print(msg)
        log_lines.append(msg)

    if chisqscale:
        # scale uncertainties for reduced chi2 == 1 at the initial guess
        logl0, model0 = like(jnp.asarray(space.free_init))
        chi0 = float(-2.0 * logl0)
        dof = max(len(np.asarray(like.data)) - space.nfree, 1)
        scale = np.sqrt(chi0 / dof)
        like.uncert = like.uncert * scale
        log(f"chisqscale: uncertainties scaled by {scale:.4f}")

    init_free = None
    if init is not None:
        init_free = np.asarray(init)
    elif leastsq:
        log("least-squares pre-fit...")
        fit = least_squares_prefit(like, space)
        log(f"  prefit: {fit}")
        rng = np.random.default_rng(seed)
        jitter = 0.01 * (space.free_max - space.free_min)
        init_free = np.clip(
            fit[None, :] + rng.normal(0, 1, (nchains, space.nfree)) * jitter,
            space.free_min, space.free_max,
        )

    sampler = EnsembleSampler(
        loglike_fn=like,
        nfree=space.nfree,
        nmodel=len(np.asarray(like.data)),
        nchains=nchains,
        walk=walk,
        pmin=space.free_min,
        pmax=space.free_max,
        stepsize=space.stepsize[space.ifree],
        fgamma=fgamma,
    )
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)

    pos_chunks, model_chunks = [], []
    done0 = 0
    if resume and checkpoint and os.path.isfile(checkpoint):
        state, pos_chunks, model_chunks, done0, key = load_checkpoint(
            checkpoint
        )
        log(f"resumed from {checkpoint} at iteration {done0}")
    else:
        state = sampler.init_state(k0, init_free, dtype=dtype)

    iters_per_chain = max(int(np.ceil(numit / nchains)), block)
    nblocks = int(np.ceil(max(iters_per_chain - done0, 0) / block))
    psrf = np.full(space.nfree, np.inf)
    converged = False
    done_iters = done0
    for ib in range(nblocks):
        key, kb = jax.random.split(key)
        state, pb, lb, mb = sampler.run_block(state, kb, block)
        done_iters += block
        # [nsteps, nchain, nfree] -> [nchain, nfree, nsteps]
        pos_chunks.append(np.asarray(pb).transpose(1, 2, 0))
        if savemodel:
            model_chunks.append(np.asarray(mb).transpose(1, 2, 0))

        if checkpoint and (ib + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint, state, pos_chunks, model_chunks,
                            done_iters, key)

        if grtest and done_iters > burnin and (ib + 1) % 10 == 0:
            chains = np.concatenate(pos_chunks, axis=2)[:, :, burnin:]
            psrf = gelman_rubin(chains.transpose(0, 2, 1))
            log(
                f"iter {done_iters*nchains:8d}/{numit}  "
                f"GR: {np.array2string(psrf, precision=4)}  "
                f"accept: {float(state.naccept.sum())/ (done_iters*nchains):.3f}"
            )
            if grexit and np.all(psrf < grbreak):
                log("Gelman-Rubin convergence reached — early exit (grexit).")
                converged = True
                break

    full = np.concatenate(pos_chunks, axis=2)        # [nchain, nfree, iters]
    posterior = full[:, :, burnin::thinning]
    models = (
        np.concatenate(model_chunks, axis=2)[:, :, burnin::thinning]
        if savemodel else None
    )
    if grtest:
        psrf = gelman_rubin(full[:, :, burnin:].transpose(0, 2, 1))
        converged = converged or bool(np.all(psrf < grbreak))

    bestp = np.asarray(state.best_pos)
    best_logl = float(state.best_loglike)
    accept = float(state.naccept.sum()) / (done_iters * nchains)
    elapsed = time.time() - t_start
    total = done_iters * nchains
    log(
        f"MCMC done: {total} samples in {elapsed:.1f}s "
        f"({total/elapsed:.0f} samples/s), accept={accept:.3f}"
    )
    log(f"best chi2 = {-2*best_logl:.4f}")

    pnames = (
        [space.pnames[i] for i in space.ifree]
        if space.pnames else [f"p{i}" for i in space.ifree]
    )

    # posterior std for the log's uncert column:
    uncert = posterior.transpose(1, 0, 2).reshape(space.nfree, -1).std(axis=1)

    if savefile:
        np.save(savefile, posterior)
    if checkpoint:
        save_checkpoint(checkpoint, state, pos_chunks, model_chunks,
                        done_iters, key)
    if savemodel and models is not None:
        np.save(savemodel, models)
        if modelper > 0:
            # split into numbered files every modelper iterations per
            # chain (reference savemodel/modelper, BART.py:208-216,
            # :582-597)
            base, ext = os.path.splitext(savemodel)
            nsplit = -(-models.shape[2] // modelper)
            for k in range(nsplit):
                np.save(f"{base}{k:02d}{ext}",
                        models[:, :, k * modelper:(k + 1) * modelper])
    if logfile:
        with open(logfile, "w") as f:
            f.write("\n".join(log_lines) + "\n\n")
            # " Best-fit params" block, parseable by the reference's
            # bestFit.read_MCMC_out (code/bestFit.py:74-92):
            f.write(" Best-fit params    Uncertainties   S/N      Sample "
                    "Span\n")
            for j in range(space.nfree):
                sn = abs(bestp[j]) / uncert[j] if uncert[j] > 0 else 0.0
                f.write(
                    f" {bestp[j]: .7e}  {uncert[j]: .7e}  {sn:9.2f}  "
                    f"{pnames[j]}\n"
                )
            f.write("\n")

    return RetrievalResult(
        posterior=posterior,
        models=models,
        bestp=bestp,
        best_loglike=best_logl,
        accept_rate=accept,
        psrf=psrf,
        pnames=pnames,
        space=space,
        niter_total=total,
        converged=converged,
    )
