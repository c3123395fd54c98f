"""PT-model golden tests against the reference formulas.

Each test re-derives the expected temperatures with numpy/scipy exactly
as written in the reference (code/PT.py) and compares the bart_tpu JAX
implementation to it.
"""

import numpy as np
import pytest
import scipy.special as sp
from scipy.ndimage import gaussian_filter1d

import jax.numpy as jnp

from bart_tpu.physics import pt

P = np.logspace(-5, 2, 100)  # bar, top-first


def ref_madhu_inv(p, a1, a2, p1, p2, p3, T3):
    p0 = p.min()
    T2 = T3 - (np.log(p3 / p2) / a2) ** 2
    T0 = T2 + (np.log(p1 / p2) / -a2) ** 2 - (np.log(p1 / p0) / a1) ** 2
    T = np.zeros_like(p)
    m1 = p < p1
    m2 = (p >= p1) & (p < p2)
    m3 = (p >= p2) & (p < p3)
    m4 = p >= p3
    T[m1] = (np.log(p[m1] / p0) / a1) ** 2 + T0
    T[m2] = (np.log(p[m2] / p2) / -a2) ** 2 + T2
    T[m3] = (np.log(p[m3] / p2) / a2) ** 2 + T2
    T[m4] = T3
    return gaussian_filter1d(T, 4, mode="nearest")


def ref_madhu_noinv(p, a1, a2, p1, p3, T3):
    p0 = p.min()
    T1 = T3 - (np.log(p3 / p1) / a2) ** 2
    T0 = T1 - (np.log(p1 / p0) / a1) ** 2
    T = np.zeros_like(p)
    m1 = p < p1
    m2 = (p >= p1) & (p < p3)
    m3 = p >= p3
    T[m1] = (np.log(p[m1] / p0) / a1) ** 2 + T0
    T[m2] = (np.log(p[m2] / p1) / a2) ** 2 + T1
    T[m3] = T3
    return gaussian_filter1d(T, 4, mode="nearest")


def ref_line(p, kappa, gamma1, gamma2, alpha, beta, Rs, Ts, Ti, a, g):
    kappa, gamma1, gamma2 = 10.0**kappa, 10.0**gamma1, 10.0**gamma2
    T_irr = beta * np.sqrt(Rs / (2 * a)) * Ts
    tau = kappa * (p * 1e6) / g

    def xi(gamma, tau):
        return (2.0 / 3) * (
            1
            + (1.0 / gamma) * (1 + (0.5 * gamma * tau - 1) * np.exp(-gamma * tau))
            + gamma * (1 - 0.5 * tau**2) * sp.expn(2, gamma * tau)
        )

    T4 = 0.75 * (
        Ti**4 * (2.0 / 3 + tau)
        + T_irr**4 * (1 - alpha) * xi(gamma1, tau)
        + T_irr**4 * alpha * xi(gamma2, tau)
    )
    return T4**0.25


def test_gaussian_smooth_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=100)
    got = np.asarray(pt.gaussian_smooth(jnp.asarray(x), 4.0))
    want = gaussian_filter1d(x, 4.0, mode="nearest")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_madhu_inversion():
    a1, a2, p1, p2, p3, T3 = 0.5, 0.2, 0.005, 0.1, 3.0, 1600.0
    T, valid = pt.pt_inversion(jnp.asarray(P), a1, a2, p1, p2, p3, T3)
    assert bool(valid)
    np.testing.assert_allclose(
        np.asarray(T), ref_madhu_inv(P, a1, a2, p1, p2, p3, T3), rtol=1e-10
    )


def test_madhu_inversion_invalid_flag():
    # T2 < 0 when (log(p3/p2)/a2)^2 > T3
    _, valid = pt.pt_inversion(jnp.asarray(P), 0.5, 0.04, 0.005, 0.01, 50.0, 100.0)
    assert not bool(valid)


def test_madhu_no_inversion():
    a1, a2, p1, p3, T3 = 0.4, 0.25, 0.005, 2.0, 1500.0
    T, valid = pt.pt_no_inversion(jnp.asarray(P), a1, a2, p1, p3, T3)
    assert bool(valid)
    np.testing.assert_allclose(
        np.asarray(T), ref_madhu_noinv(P, a1, a2, p1, p3, T3), rtol=1e-10
    )


def test_line2013():
    Rsun = 6.995e8
    Rs, Ts, Ti, a, g = 0.756 * Rsun, 5040.0, 100.0, 0.031 * 1.495978707e11, 2192.8
    args = (-1.5, -0.8, -0.8, 0.5, 1.0)
    T, valid = pt.pt_line(jnp.asarray(P), *args, Rs, Ts, Ti, a, g)
    assert bool(valid)
    np.testing.assert_allclose(
        np.asarray(T), ref_line(P, *args, Rs, Ts, Ti, a, g), rtol=1e-8
    )


def test_line2013_thorngren():
    Rsun = 6.995e8
    Rs, Ts, a, g = 0.756 * Rsun, 5040.0, 0.031 * 1.495978707e11, 2192.8
    T, _ = pt.pt_line(
        jnp.asarray(P), -1.5, -0.8, -0.8, 0.5, 1.0, Rs, Ts, 100.0, a, g,
        T_int_type="thorngren",
    )
    # Thorngren T_int from the reference formula (code/PT.py:680-685):
    sb = 5.670367e-8
    T_eq = np.sqrt(Rs / (2 * a)) * Ts
    F = 4.0 * sb * T_eq**4
    Ti = 1.24 * T_eq * np.exp(-((np.log(F) - 0.14) ** 2) / 2.96)
    want = ref_line(P, -1.5, -0.8, -0.8, 0.5, 1.0, Rs, Ts, Ti, a, g)
    np.testing.assert_allclose(np.asarray(T), want, rtol=1e-8)


def test_iso_adiabatic():
    T, valid = pt.pt_iso(jnp.asarray(P), 1234.5)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(T), np.full_like(P, 1234.5))

    T, valid = pt.pt_adiabatic(jnp.asarray(P), 1500.0, 1.4, 1.0)
    want = 1500.0 / (1 + (1.4 - 1) / 1.4 * np.log(10.0 / P))
    np.testing.assert_allclose(np.asarray(T), want, rtol=1e-12)


def test_piette():
    import scipy.interpolate as si

    pars = (1300.0, 250.0, 150.0, 100.0, 80.0, 60.0, 40.0, 30.0)
    T, valid = pt.pt_piette(jnp.asarray(P), *pars)
    assert bool(valid)

    # Reference re-derivation (code/PT.py:752-812):
    T0, dTbot_32, dT32_10, dT10_0, dT0_1, dT1_01, dT01_001, dT001_top = pars
    p = P
    idx = {
        "top": np.argmin(p),
        "001": np.argmin(np.abs(p - 0.01)),
        "01": np.argmin(np.abs(p - 0.1)),
        "1": np.argmin(np.abs(p - 1)),
        "0": np.argmin(np.abs(p - 3.2)),
        "10": np.argmin(np.abs(p - 10)),
        "32": np.argmin(np.abs(p - 32)),
        "bot": np.argmax(p),
    }
    Tv = np.zeros_like(p)
    Tv[idx["0"]] = T0
    Tv[idx["10"]] = T0 + dT10_0
    Tv[idx["32"]] = Tv[idx["10"]] + dT32_10
    Tv[idx["bot"]] = Tv[idx["32"]] + dTbot_32
    Tv[idx["1"]] = T0 - dT0_1
    Tv[idx["01"]] = Tv[idx["1"]] - dT1_01
    Tv[idx["001"]] = Tv[idx["01"]] - dT01_001
    Tv[idx["top"]] = Tv[idx["001"]] - dT001_top
    ilays = np.array([idx[k] for k in ("top", "001", "01", "1", "0", "10", "32", "bot")])
    rep = si.splrep(np.log10(p[ilays]), Tv[ilays], k=1)
    Tref = si.splev(np.log10(p), rep)
    sig = 0.3 / abs(np.log10(p)[0] - np.log10(p)[1])
    Tref = gaussian_filter1d(Tref, sigma=sig, mode="nearest")

    np.testing.assert_allclose(np.asarray(T), Tref, rtol=5e-4)


def test_generator_dispatch():
    T, valid = pt.pt_generator(jnp.asarray(P), jnp.asarray([1000.0]), "iso")
    assert bool(valid) and np.allclose(np.asarray(T), 1000.0)
