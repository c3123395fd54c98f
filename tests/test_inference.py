"""Sampler known-answer tests (the test style MC3 ships: quadratic fits
and Gaussian targets; reference SURVEY.md section 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bart_tpu.inference.gr import gelman_rubin
from bart_tpu.inference.likelihood import Likelihood, ParamSpace
from bart_tpu.inference.retrieval import run_mcmc
from bart_tpu.inference.samplers import EnsembleSampler


def make_gaussian_sampler(walk, nfree=3, nchains=16, seed=0):
    sigma = jnp.asarray([1.0, 2.0, 0.5][:nfree])

    def loglike(x):
        return -0.5 * jnp.sum((x / sigma) ** 2), x[:1]

    return EnsembleSampler(
        loglike_fn=loglike,
        nfree=nfree,
        nmodel=1,
        nchains=nchains,
        walk=walk,
        pmin=np.full(nfree, -50.0),
        pmax=np.full(nfree, 50.0),
        stepsize=np.full(nfree, 0.7),
    ), np.asarray(sigma)


@pytest.mark.parametrize("walk", ["mrw", "demc", "snooker"])
def test_gaussian_target(walk):
    sampler, sigma = make_gaussian_sampler(walk)
    key = jax.random.key(1)
    key, k0 = jax.random.split(key)
    state = sampler.init_state(k0, np.zeros((16, 3)))
    chunks = []
    for _ in range(20):
        key, kb = jax.random.split(key)
        state, pb, lb, mb = sampler.run_block(state, kb, 200)
        chunks.append(np.asarray(pb))
    samples = np.concatenate(chunks)[1000:]  # [iters, chain, nfree]
    flat = samples.reshape(-1, 3)
    assert np.abs(flat.mean(0)).max() < 0.15
    np.testing.assert_allclose(flat.std(0), sigma, rtol=0.1)
    accept = float(state.naccept.sum()) / (16 * 4000)
    assert 0.1 < accept < 0.95


@pytest.mark.parametrize("walk", ["mrw", "demc", "snooker"])
def test_flat_posterior_is_uniform_under_reflection(walk):
    """Detailed-balance check for boundary reflection: on a FLAT
    likelihood over the prior box, the stationary distribution must be
    exactly uniform.  An asymmetric fold (or a wrong Metropolis
    correction interacting with it) biases density toward or away
    from the boundaries — precisely what this measures: bin occupancy
    over each marginal, plus uniform moments.  Step scales are set
    comparable to the box so proposals fold at the walls constantly."""
    nfree, nchains = 2, 32
    lo, hi = -1.0, 3.0

    def loglike(x):
        # bounds enforced in the likelihood, as the real Likelihood
        # class does (samplers fold only SYMMETRIC proposals; snooker
        # moves rely on this rejection)
        inb = jnp.all((x >= lo) & (x <= hi))
        return jnp.where(inb, 0.0, -jnp.inf), x[:1]

    sampler = EnsembleSampler(
        loglike_fn=loglike, nfree=nfree, nmodel=1, nchains=nchains,
        walk=walk, pmin=np.full(nfree, lo), pmax=np.full(nfree, hi),
        stepsize=np.full(nfree, 2.5),   # mrw folds on most proposals
    )
    key = jax.random.key(3)
    key, k0 = jax.random.split(key)
    state = sampler.init_state(k0)
    chunks = []
    for _ in range(10):
        key, kb = jax.random.split(key)
        state, pb, lb, mb = sampler.run_block(state, kb, 300)
        chunks.append(np.asarray(pb))
    flat = np.concatenate(chunks)[500:].reshape(-1, nfree)

    width = hi - lo
    assert np.abs(flat.mean(0) - (lo + hi) / 2).max() < 0.05 * width
    np.testing.assert_allclose(flat.std(0), width / np.sqrt(12.0),
                               rtol=0.05)
    # 10-bin occupancy within 10% of uniform in every marginal —
    # boundary bins included (where a fold asymmetry would show first)
    for j in range(nfree):
        h, _ = np.histogram(flat[:, j], bins=10, range=(lo, hi))
        np.testing.assert_allclose(h / h.mean(), 1.0, atol=0.1)


def test_unif_walk_bounds():
    sampler, _ = make_gaussian_sampler("unif")
    key = jax.random.key(2)
    state = sampler.init_state(key, np.zeros((16, 3)))
    state, pb, lb, mb = sampler.run_block(state, key, 100)
    pb = np.asarray(pb)
    assert pb.min() >= -50 and pb.max() <= 50
    # uniform sweep covers the space (not stuck at 0)
    assert pb.std() > 10.0


def test_param_space_expand():
    space = ParamSpace(
        pinit=[1.0, 2.0, 3.0, 4.0],
        pmin=[0, 0, 0, 0],
        pmax=[10, 10, 10, 10],
        stepsize=[0.1, 0.0, 0.2, -1.0],  # free, fixed, free, shared<-free0
    )
    assert space.nfree == 2
    full = np.asarray(space.expand(jnp.asarray([7.0, 9.0])))
    np.testing.assert_allclose(full, [7.0, 2.0, 9.0, 7.0])


def test_quadratic_fit_recovers_truth():
    # y = a + b x + c x^2 with noise; MC3-style known-answer regression
    rng = np.random.default_rng(3)
    x = np.linspace(0, 10, 50)
    a, b, c = 3.0, -2.4, 0.5
    sigma = 1.0
    y = a + b * x + c * x**2 + rng.normal(0, sigma, x.size)

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def forward(p):
        model = p[0] + p[1] * xj + p[2] * xj**2
        return model, model, jnp.asarray(True)

    space = ParamSpace(
        pinit=[0.0, 0.0, 0.0],
        pmin=[-10, -10, -10],
        pmax=[10, 10, 10],
        stepsize=[0.1, 0.05, 0.01],
        pnames=["a", "b", "c"],
    )
    like = Likelihood(forward, space, y, np.full_like(y, sigma))
    res = run_mcmc(
        like, space, nchains=8, numit=240000, burnin=2000, walk="snooker",
        seed=4, block=200, verbose=False, grtest=True,
    )
    flat = res.posterior.transpose(1, 0, 2).reshape(3, -1)
    # classical least-squares solution for comparison:
    A = np.vander(x, 3, increasing=True)
    ls = np.linalg.lstsq(A, y, rcond=None)[0]
    np.testing.assert_allclose(flat.mean(1), ls, atol=0.15)
    assert np.all(res.psrf < 1.1)
    # posterior stds match analytic (A^T A)^-1 sigma^2 diagonal within 25%
    cov = np.linalg.inv(A.T @ A) * sigma**2
    np.testing.assert_allclose(flat.std(1), np.sqrt(np.diag(cov)), rtol=0.3)


def test_gr_converged_vs_not():
    rng = np.random.default_rng(5)
    good = rng.normal(0, 1, (8, 500, 2))
    psrf = gelman_rubin(good)
    assert np.all(psrf < 1.05)
    # diverged: each chain at a different location
    bad = good + np.arange(8)[:, None, None] * 10.0
    psrf_bad = gelman_rubin(bad)
    assert np.all(psrf_bad > 2.0)


def test_grexit_gates_on_split_rhat():
    """Early exit must gate on the rank-normalized split-R-hat: on a
    shared-drift ensemble (every chain still descending together — the
    plateau/drift shape this problem's posterior has) plain GR reads
    converged while the split statistic refuses."""
    from bart_tpu.inference.gr import split_rhat_rank

    rng = np.random.default_rng(21)
    drift = rng.normal(0, 1, (8, 600, 2))
    drift += np.linspace(0, 6, 600)[None, :, None]
    assert np.all(gelman_rubin(drift) < 1.05)     # classic: fooled
    assert np.all(split_rhat_rank(drift) > 1.05)  # split/rank: not

    # and run_mcmc's grexit wiring uses the split statistic: an easy
    # unimodal problem exits early, converged by split-R-hat
    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0, 0.0], [-5, -5], [5, 5], [0.1, 0.1])
    like = Likelihood(forward, space, np.array([1.0, -1.0]),
                      np.array([0.1, 0.1]))
    res = run_mcmc(like, space, nchains=8, numit=400000, burnin=400,
                   walk="snooker", seed=7, block=100, verbose=False,
                   grtest=True, grexit=True, grbreak=1.02)
    assert res.converged
    assert res.niter_total < 400000          # actually exited early
    assert np.all(res.psrf_rank < 1.02)      # by the split statistic


def test_effective_sample_size_known_answers():
    """Bulk ESS (Vehtari et al. 2021): ~N for iid draws; N(1-rho)/
    (1+rho) for AR(1) (rho=0.9 -> tau=19 -> 421 of 8000, estimator
    lands within ~10%); ~nchain for diverged chains."""
    from bart_tpu.inference.gr import effective_sample_size

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (8, 1000, 2))
    ess = effective_sample_size(x)
    assert np.all(ess > 0.75 * 8000), ess

    rho = 0.9
    e = rng.normal(0, 1, (8, 1000, 2))
    y = np.empty_like(e)
    y[:, 0] = e[:, 0]
    for t in range(1, 1000):
        y[:, t] = rho * y[:, t - 1] + np.sqrt(1 - rho**2) * e[:, t]
    ess_ar = effective_sample_size(y)
    want = 8000 * (1 - rho) / (1 + rho)
    np.testing.assert_allclose(ess_ar, want, rtol=0.25)

    bad = x + np.arange(8)[:, None, None] * 10.0
    assert np.all(effective_sample_size(bad) < 50)


def test_split_rhat_rank_properties():
    """Rank-normalized split-R-hat (Vehtari et al. 2021):
    * ~1 for iid chains, regardless of marginal shape (heavy tails
      included — the property the classic statistic lacks);
    * catches cross-chain location differences;
    * catches WITHIN-chain trends via the split (a drifting chain
      looks converged to the unsplit classic statistic);
    * catches scale (variance) mismatch via the folded term."""
    from bart_tpu.inference.gr import split_rhat_rank

    rng = np.random.default_rng(11)
    # heavy-tailed iid draws (Cauchy): rank normalization handles them
    good = rng.standard_cauchy((8, 500, 2))
    assert np.all(split_rhat_rank(good) < 1.05)

    bad_loc = good + np.arange(8)[:, None, None] * 10.0
    assert np.all(split_rhat_rank(bad_loc) > 1.5)

    # drifting chains: same drift in every chain -> classic
    # (unsplit-half) GR on the second half misses much of it, the
    # split statistic does not
    drift = rng.normal(0, 1, (8, 500, 2))
    drift += np.linspace(0, 8, 500)[None, :, None]
    assert np.all(split_rhat_rank(drift) > 1.3)

    # scale mismatch, equal means: the folded term catches it
    scale = rng.normal(0, 1, (8, 500, 1))
    scale[:4] *= 6.0
    assert np.all(split_rhat_rank(scale) > 1.1)


def test_likelihood_priors_and_bounds():
    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0], [-5.0], [5.0], [0.1])
    data = np.array([0.0])
    unc = np.array([1.0])
    like = Likelihood(forward, space, data, unc,
                      prior=np.array([1.0]), priorlow=np.array([0.5]),
                      priorup=np.array([0.5]))
    l_at_prior = float(like(jnp.asarray([1.0]))[0])
    l_off = float(like(jnp.asarray([2.0]))[0])
    # moving one prior-sigma away costs 0.5 plus the data chi2 change
    want = (-0.5 * 4.0 - 0.5 * 4.0) - (-0.5 * 1.0 - 0.0)
    assert l_off - l_at_prior == pytest.approx(want, abs=1e-10)
    # out of bounds -> -inf
    assert np.isneginf(float(like(jnp.asarray([7.0]))[0]))


def test_logfile_format(tmp_path):
    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0, 0.0], [-5, -5], [5, 5], [0.1, 0.1],
                       pnames=["alpha", "beta"])
    like = Likelihood(forward, space, np.array([1.0, -1.0]),
                      np.array([0.1, 0.1]))
    logf = str(tmp_path / "MCMC.log")
    res = run_mcmc(like, space, nchains=4, numit=4000, burnin=100,
                   walk="demc", seed=6, block=100, verbose=False,
                   logfile=logf, savefile=str(tmp_path / "output.npy"))
    # parse back with the reference's algorithm (bestFit.read_MCMC_out)
    lines = open(logf).readlines()
    ini = max(i for i, l in enumerate(lines) if l.startswith(" Best-fit params")) + 1
    vals = []
    for l in lines[ini:]:
        if not l.strip():
            break
        vals.append([float(x) for x in l.split()[:2]])
    vals = np.asarray(vals)
    assert vals.shape == (2, 2)
    np.testing.assert_allclose(vals[:, 0], [1.0, -1.0], atol=0.1)
    # output.npy layout [nchain, nfree, niter]
    post = np.load(tmp_path / "output.npy")
    assert post.shape[0] == 4 and post.shape[1] == 2


def test_checkpoint_resume(tmp_path):
    """A run interrupted at iteration k and resumed reproduces the
    uninterrupted run's sample stream exactly (bitwise resume)."""

    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0, 0.0], [-5, -5], [5, 5], [0.1, 0.1])
    like = Likelihood(forward, space, np.array([1.0, -1.0]),
                      np.array([0.3, 0.3]))
    from bart_tpu.inference.retrieval import run_mcmc

    ckpt = str(tmp_path / "ck.npz")
    # full run in one go:
    full = run_mcmc(like, space, nchains=4, numit=3200, burnin=0,
                    walk="snooker", seed=11, block=100, verbose=False,
                    grtest=False)
    # first half with checkpointing (checkpoint_every=4 blocks=400 it):
    run_mcmc(like, space, nchains=4, numit=1600, burnin=0,
             walk="snooker", seed=11, block=100, verbose=False,
             grtest=False, checkpoint=ckpt)
    # resume to the full length:
    resumed = run_mcmc(like, space, nchains=4, numit=3200, burnin=0,
                       walk="snooker", seed=11, block=100, verbose=False,
                       grtest=False, checkpoint=ckpt, resume=True)
    assert resumed.posterior.shape == full.posterior.shape
    np.testing.assert_allclose(resumed.posterior, full.posterior, rtol=1e-12)


def test_checkpoint_resume_nz_mismatch(tmp_path):
    """A checkpoint written under a different snooker-archive-size
    default resumes with the CHECKPOINT's archive size (a silent
    size mismatch would clamp the ring-buffer scatter indices and
    statistically degrade the archive with no error)."""
    from bart_tpu.inference.retrieval import (load_checkpoint, run_mcmc,
                                              save_checkpoint)

    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0, 0.0], [-5, -5], [5, 5], [0.1, 0.1])
    like = Likelihood(forward, space, np.array([1.0, -1.0]),
                      np.array([0.3, 0.3]))
    ckpt = str(tmp_path / "ck.npz")
    run_mcmc(like, space, nchains=4, numit=1600, burnin=0,
             walk="snooker", seed=11, block=100, verbose=False,
             grtest=False, checkpoint=ckpt)
    # shrink the archive to an old default (2*nchains=8 < today's 100)
    state, done, key, fg = load_checkpoint(ckpt)
    state = state._replace(z_archive=state.z_archive[:8],
                           z_count=jnp.minimum(state.z_count, 8))
    save_checkpoint(ckpt, state, done, key, fg)
    res = run_mcmc(like, space, nchains=4, numit=3200, burnin=0,
                   walk="snooker", seed=11, block=100, verbose=False,
                   grtest=False, checkpoint=ckpt, resume=True)
    # resumed fine, and the re-written checkpoint keeps the loaded size
    state2, done2, _, _ = load_checkpoint(ckpt)
    assert state2.z_archive.shape[0] == 8
    assert done2 == 800
    assert np.all(np.isfinite(res.posterior))


def test_modelper_split(tmp_path):
    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0], [-5], [5], [0.1])
    like = Likelihood(forward, space, np.array([1.0]), np.array([0.3]))
    from bart_tpu.inference.retrieval import run_mcmc

    sm = str(tmp_path / "models.npy")
    res = run_mcmc(like, space, nchains=4, numit=1200, burnin=100,
                   walk="mrw", seed=12, block=100, verbose=False,
                   grtest=False, savemodel=sm, modelper=100)
    whole = np.load(sm)
    # savemodel keeps the FULL history (burn-in included): 1200/4 = 300
    # iterations per chain regardless of burnin (MC3 semantics).
    assert whole.shape == (4, 1, 300)
    parts = [np.load(str(tmp_path / f"models{k:02d}.npy"))
             for k in range(-(-whole.shape[2] // 100))]
    # each split holds modelper iterations/chain = modelper*nchains
    # models (reference: BART.py:208-216 "nchains=10 and modelper=5 ...
    # every 50 models to a new .NPY file")
    assert all(p.shape == (4, 1, 100) for p in parts)
    np.testing.assert_allclose(np.concatenate(parts, axis=2), whole)


def test_modelper_unif_subdir(tmp_path):
    """unif sweeps move numbered model files into a subdirectory named
    after savemodel (reference: BART.py:582-597)."""
    def forward(p):
        return p, p, jnp.asarray(True)

    space = ParamSpace([0.0], [-5], [5], [0.1])
    like = Likelihood(forward, space, np.array([1.0]), np.array([0.3]))
    from bart_tpu.inference.retrieval import run_mcmc

    sm = str(tmp_path / "models.npy")
    run_mcmc(like, space, nchains=4, numit=800, burnin=0,
             walk="unif", seed=12, block=100, verbose=False,
             grtest=False, savemodel=sm, modelper=100)
    mdir = tmp_path / "models"
    assert mdir.is_dir()
    assert sorted(p.name for p in mdir.iterdir()) == [
        "models00.npy", "models01.npy"]


# ---------------------------------------------------------------------------
# Wavelet (Carter & Winn 2009) likelihood — MC3 dwt.c equivalent


def test_dwt_orthonormal():
    from bart_tpu.inference.wavelet import dwt_db4

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=64))
    coeffs = dwt_db4(x)
    assert [c.shape[0] for c in coeffs] == [32, 16, 8, 4, 2, 1, 1]
    total = sum(float(jnp.sum(c * c)) for c in coeffs)
    np.testing.assert_allclose(total, float(jnp.sum(x * x)), rtol=1e-10)


def test_wavelet_white_noise_identity():
    """sigma_r = 0 must reduce exactly to the white Gaussian loglike
    (DWT orthonormality)."""
    from bart_tpu.inference.wavelet import wavelet_loglike

    rng = np.random.default_rng(4)
    for n in (16, 10):  # power of two and padded
        r = rng.normal(size=n) * 0.3
        sig = 0.3
        wl = float(wavelet_loglike(jnp.asarray(r), 1.0, 0.0, sig))
        npad = 16
        gauss = -0.5 * np.sum(r**2) / sig**2 \
                - 0.5 * npad * np.log(2 * np.pi * sig**2)
        np.testing.assert_allclose(wl, gauss, rtol=1e-10)


def test_wavelet_prefers_red_noise_model():
    """Strongly correlated residuals: the red+white model must beat
    the white-only model, and the likelihood must be jit/grad-safe."""
    from bart_tpu.inference.wavelet import wavelet_loglike

    rng = np.random.default_rng(5)
    # random-walk (1/f^2-ish) residuals
    r = jnp.asarray(np.cumsum(rng.normal(size=64)) * 0.1)
    white = float(wavelet_loglike(r, 1.0, 0.0, float(np.std(np.asarray(r)))))
    red = float(wavelet_loglike(r, 1.0, 2.0 * float(np.std(np.asarray(r))),
                                0.05))
    assert red > white
    g = jax.grad(lambda s: wavelet_loglike(r, 1.0, s, 0.1))(1.0)
    assert np.isfinite(float(g))


def test_wlike_likelihood_mode():
    """Likelihood(wlike=True): last 3 params are (gamma, sigma_r,
    sigma_w); forward gets the rest."""
    data = np.array([1.0, 2.0, 3.0, 4.0])

    def forward(p):
        return p[0] * jnp.arange(1.0, 5.0), None, jnp.asarray(True)

    space = ParamSpace(
        pinit=[1.0, 1.0, 0.0, 0.1],
        pmin=[0.0, 1.0, 0.0, 1e-3], pmax=[2.0, 1.0, 1.0, 1.0],
        stepsize=[0.1, 0.0, 0.0, 0.1],  # gamma and sigma_r fixed
    )
    like = Likelihood(forward, space, data, np.full(4, 0.1), wlike=True)
    l_true, model = like(jnp.asarray([1.0, 0.1]))
    l_off, _ = like(jnp.asarray([1.2, 0.1]))
    assert model.shape == (4,)
    assert float(l_true) > float(l_off)
    # matches the direct white-noise wavelet value (sigma_r = 0)
    from bart_tpu.inference.wavelet import wavelet_loglike

    direct = float(wavelet_loglike(jnp.zeros(4), 1.0, 0.0, 0.1))
    np.testing.assert_allclose(float(l_true), direct, rtol=1e-10)


def test_seed_reproducibility():
    """Same seed -> bitwise-identical posterior (the BASELINE
    'bitwise-stable posteriors' target: deterministic reductions and
    counter-based RNG, independent of host state)."""
    def forward(p):
        model = p[0] * jnp.arange(1.0, 6.0)
        return model, model, jnp.asarray(True)

    space = ParamSpace(pinit=[1.0], pmin=[-5.0], pmax=[5.0], stepsize=[0.1])
    data = np.arange(1.0, 6.0) * 1.3
    uncert = np.full(5, 0.1)

    runs = []
    for _ in range(2):
        like = Likelihood(forward, space, data, uncert)
        res = run_mcmc(like, space, nchains=4, numit=2000, burnin=100,
                       walk="snooker", seed=7, verbose=False, grtest=False)
        runs.append(res.posterior.copy())
    np.testing.assert_array_equal(runs[0], runs[1])
