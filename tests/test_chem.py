"""Equilibrium-chemistry tests: analytic reaction constants, element
conservation, and the classic solar-composition behaviors."""

import numpy as np
import pytest

import jax.numpy as jnp

from bart_tpu.chem.tea import (
    _stoich_matrix,
    equilibrium_abundances,
    solve_equilibrium,
)
from bart_tpu.chem.thermo import gibbs_rt
from bart_tpu.io.abundances import read_elements

REF = "/root/reference"
SPECIES = ["H", "He", "C", "N", "O", "H2", "CO", "CO2", "CH4", "H2O", "N2", "NH3"]
ELEMENTS = ["H", "He", "C", "N", "O"]


@pytest.fixture(scope="module")
def elems():
    return read_elements(f"{REF}/inputs/abundances_Asplund2009.txt")


def equilibrium(elems, T0, p=None):
    p = p if p is not None else np.logspace(-5, 2, 16)
    T = np.full(len(p), T0)
    return p, equilibrium_abundances(SPECIES, ELEMENTS, p, T, elems)


def test_reaction_constant_exact():
    # H2 <-> 2H: the solution must satisfy the analytic mass-action law
    A = _stoich_matrix(["H", "H2"], ["H"])
    for T in (2500.0, 3500.0, 5000.0):
        for lnp in (-2.0, 0.0, 2.0):
            g = jnp.array([float(gibbs_rt("H", T)), float(gibbs_rt("H2", T))])
            x = np.asarray(
                solve_equilibrium(A, g, jnp.array([1.0]), jnp.asarray(lnp))
            )
            kp_model = x[0] ** 2 / x[1] * np.exp(lnp)
            kp_true = np.exp(-(2 * g[0] - g[1]))
            assert kp_model == pytest.approx(kp_true, rel=1e-8)


def test_element_conservation(elems):
    p, q = equilibrium(elems, 1400.0)
    A = _stoich_matrix(SPECIES, ELEMENTS)
    for i in range(len(p)):
        m = A.T @ q[i]
        # all element ratios must match the input abundances exactly
        want = np.array([10.0 ** elems.dex_of(e) for e in ELEMENTS])
        np.testing.assert_allclose(m / m[0], want / want[0], rtol=1e-6)
    assert np.allclose(q.sum(axis=1), 1.0, rtol=1e-8)


def test_co_ch4_transition(elems):
    # carbon is CH4 at low T, CO at high T (solar C/O, ~1 bar)
    _, q_cool = equilibrium(elems, 700.0)
    _, q_hot = equilibrium(elems, 1600.0)
    d_cool = dict(zip(SPECIES, q_cool[12]))  # ~1 bar
    d_hot = dict(zip(SPECIES, q_hot[12]))
    assert d_cool["CH4"] > 10 * d_cool["CO"]
    assert d_hot["CO"] > 10 * d_hot["CH4"]
    # H2O drops by roughly the CO fraction when CO locks up oxygen:
    assert d_hot["H2O"] < d_cool["H2O"]


def test_h2_dominance_and_dissociation(elems):
    _, q = equilibrium(elems, 1000.0)
    d = dict(zip(SPECIES, q[8]))
    assert d["H2"] > 0.8
    assert d["He"] == pytest.approx(0.145, abs=0.02)

    # at 3000 K and low pressure, atomic H becomes significant
    p, q_hot = equilibrium(elems, 3000.0)
    d_top = dict(zip(SPECIES, q_hot[0]))    # 1e-5 bar
    d_bot = dict(zip(SPECIES, q_hot[-1]))   # 100 bar
    assert d_top["H"] > 0.5                 # dissociated at low p
    assert d_bot["H"] < 0.05                # recombined at high p


def test_metallicity_scaling(elems):
    from bart_tpu.io.abundances import scale_abundances

    rich = scale_abundances(elems, solar_times=10.0)
    p, q1 = equilibrium(elems, 1500.0)
    _, q10 = equilibrium(rich, 1500.0)
    i = 10
    d1 = dict(zip(SPECIES, q1[i]))
    d10 = dict(zip(SPECIES, q10[i]))
    # 10x metals -> ~10x H2O and CO
    assert d10["H2O"] / d1["H2O"] == pytest.approx(10.0, rel=0.2)
    assert d10["CO"] / d1["CO"] == pytest.approx(10.0, rel=0.2)


def test_co_swap(elems):
    from bart_tpu.io.abundances import scale_abundances

    swapped = scale_abundances(elems, co_swap=True)
    _, q = equilibrium(swapped, 1600.0)
    d = dict(zip(SPECIES, q[12]))
    A = _stoich_matrix(SPECIES, ELEMENTS)
    m = A.T @ q[12]
    # C/O now > 1: oxygen locked in CO, H2O suppressed vs CH4-free case
    assert m[2] / m[4] > 1.0
    assert d["CO"] > 5 * d["H2O"]


def test_ion_species_parse():
    # stoichiometry with electrons: H- and e-
    A = _stoich_matrix(["H", "H-", "e-"], ["H", "e"])
    np.testing.assert_allclose(A, [[1, 0], [1, 1], [0, 1]])
