"""End-to-end retrieval: the demo CH4 eclipse slice (SURVEY.md section 7).

Generates synthetic eclipse depths from a known truth with the full
forward model (PT-line profile + CH4 opacity + band integration), then
runs the snooker retrieval and checks the truth is recovered within
posterior uncertainty — the regression-test role the WASP-12b example
plays for the reference (manual tex:354-359).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bart_tpu.inference.likelihood import Likelihood, ParamSpace
from bart_tpu.inference.retrieval import run_mcmc
from test_rt import make_demo_forward, DEMO_PARAMS

TRUTH = np.array([-1.8, 0.1, 1.0, 0.0, 0.95, -0.7])


@pytest.fixture(scope="module")
def demo_problem():
    fm = make_demo_forward("eclipse")
    f = fm.jitted()
    bf, _, valid = f(jnp.asarray(TRUTH))
    assert bool(valid)
    data = np.asarray(bf)
    uncert = 0.03 * data  # 3% error bars
    rng = np.random.default_rng(42)
    data_noisy = data + rng.normal(0, 1, data.shape) * uncert
    return fm, data_noisy, uncert


def test_demo_eclipse_retrieval(demo_problem):
    fm, data, uncert = demo_problem
    # demo cfg free-parameter setup (examples/demo/BART_eclipse.cfg):
    # kappa, g1 free; g2, alpha fixed; beta, CH4 free
    space = ParamSpace(
        pinit=DEMO_PARAMS.copy(),
        pmin=[-5.0, -2.0, -2.0, 0.0, 0.55, -9.0],
        pmax=[-1.0, 1.0, 1.0, 1.0, 1.2, 1.5],
        stepsize=[0.01, 0.01, 0.0, 0.0, 0.001, 0.1],
        pnames=["kappa", "g1", "g2", "alpha", "beta", "CH4"],
    )
    like = Likelihood(fm, space, data, uncert)
    res = run_mcmc(
        like, space, nchains=8, numit=48000, burnin=600, walk="snooker",
        seed=7, block=150, verbose=False, grtest=True,
    )
    flat = res.posterior.transpose(1, 0, 2).reshape(space.nfree, -1)
    mean = flat.mean(1)
    std = flat.std(1)
    truth_free = TRUTH[space.ifree]

    # truth recovered within 3.5 sigma for every free parameter:
    pulls = np.abs(mean - truth_free) / np.maximum(std, 1e-12)
    assert np.all(pulls < 3.5), (mean, std, truth_free, pulls)

    # best fit reproduces the data well (chi2/dof ~ 1):
    chi2 = -2.0 * res.best_loglike
    assert chi2 / len(data) < 3.0

    # convergence reasonably progressed:
    assert np.all(res.psrf < 1.3)


def test_demo_transit_retrieval_shape(demo_problem):
    """Transit geometry end-to-end (shorter: just verify the machinery)."""
    fm = make_demo_forward("transit")
    f = fm.jitted()
    params = np.concatenate([TRUTH[:5], [fm.r0_km], TRUTH[5:]])
    bf, _, valid = f(jnp.asarray(params))
    assert bool(valid)
    data = np.asarray(bf)
    uncert = 0.01 * data
    space = ParamSpace(
        pinit=params.copy(),
        pmin=[-5.0, -2.0, -2.0, 0.0, 0.55, 0.8 * fm.r0_km, -9.0],
        pmax=[-1.0, 1.0, 1.0, 1.0, 1.2, 1.2 * fm.r0_km, 1.5],
        stepsize=[0.01, 0.01, 0.0, 0.0, 0.001, 100.0, 0.1],
    )
    like = Likelihood(fm, space, data, uncert)
    res = run_mcmc(like, space, nchains=6, numit=6000, burnin=200,
                   walk="demc", seed=8, block=100, verbose=False,
                   grtest=False)
    assert res.posterior.shape[0] == 6
    assert np.isfinite(res.best_loglike)
    # best-fit chi2 should be small (we started at truth)
    assert -2 * res.best_loglike < 10.0
