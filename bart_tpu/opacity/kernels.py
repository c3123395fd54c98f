"""Pallas TPU kernel for the line-by-line cross-section sum.

The hot op of the opacity-grid build (SURVEY.md 3.3; the reference's
extinction.c/voigt.c): for every (condition, wavenumber-tile) pair,
sum Voigt profiles over that tile's line bucket.

The pure-jnp path (opacity/extinction.py) materializes a
[lines, tile_width] profile tensor per condition in HBM between the
Faddeeva evaluation and the reduction.  This kernel fuses strength
evaluation, Voigt profile, truncation mask, and the line-sum in VMEM:
lines stream through an (8, W) register block with a fori_loop, so HBM
traffic is exactly inputs + one [W] output row per program — the op
becomes compute-bound on the VPU instead of bandwidth-bound.

Per-condition scalars (line-strength partition ratio, Doppler
coefficient, Lorentz HWHM) are precomputed on host and delivered via
scalar prefetch.

Status: compiles and validates on TPU (f32 parity ~1e-4 median against
the jnp path), but the per-chunk lane->sublane relayout of line data
currently makes it slower than XLA's fused jnp path on v5e — XLA fuses
the profile/reduction chain well on its own.  Kept as the scaffold for
a future layout iteration (line data staged via SMEM scalar reads with
host-precomputed per-(cond,line) strengths); the jnp path remains the
default in opacity.grid.build_opacity_grid.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bart_tpu import constants as const
from bart_tpu.linelist.hitran import TREF
from bart_tpu.physics.voigt import _weideman_coeffs

__all__ = ["cross_section_pallas"]

_SQRT_2LN2 = float(np.sqrt(2.0 * np.log(2.0)))
_INV_SQRT_PI = float(1.0 / np.sqrt(np.pi))
_LINE_CHUNK = 8  # sublane-aligned lines per inner step


def _faddeeva_block(x, y, ell, a):
    """Re[w(x+iy)] Weideman series on a block (real arithmetic,
    identical math to physics.voigt.faddeeva_real)."""
    dr = ell + y
    di = -x
    inv_d2 = 1.0 / (dr * dr + di * di)
    nr = ell - y
    ni = x
    tr = (nr * dr + ni * di) * inv_d2
    ti = (ni * dr - nr * di) * inv_d2
    pr = jnp.full_like(tr, a[0])
    pi = jnp.zeros_like(tr)
    for k in range(1, len(a)):
        pr, pi = pr * tr - pi * ti + a[k], pr * ti + pi * tr
    inv_r = dr * inv_d2
    inv_i = -di * inv_d2
    sq_r = inv_r * inv_r - inv_i * inv_i
    sq_i = 2.0 * inv_r * inv_i
    return 2.0 * (pr * sq_r - pi * sq_i) + _INV_SQRT_PI * inv_r


def _kernel(scal_ref, wn_ref, wn0_ref, sgw_ref, elo_ref, out_ref,
            *, n_chunks, ell, a_coeffs, nwidth, c2, tref):
    """One program: out[1, W] = sum over this tile's lines.

    scal_ref (prefetch): [ncond, 4] rows (T, qratio, dopp_coef, gamma_L)
    wn_ref:  [1, W] tile wavenumbers
    wn0_ref: [1, L] line centers          (0 for padding)
    sgw_ref: [1, L] S296 * weight         (0 for padding)
    elo_ref: [1, L] lower-state energies
    """
    c = pl.program_id(0)
    T = scal_ref[c, 0]
    qr = scal_ref[c, 1]
    dopp = scal_ref[c, 2]      # sigma_gauss = dopp * wn0
    gl = scal_ref[c, 3]        # Lorentz HWHM (collision mode: line-indep)

    wn_row = wn_ref[0, 0, :]                   # [W]
    W = wn_row.shape[0]

    def body(i, acc):
        # line arrays are [1, L/8, 8]: one dynamic-sublane row gives 8
        # lines, relayouted to [8, 1] for the lines-x-wavenumbers block
        wn0 = wn0_ref[0, pl.ds(i, 1), :].reshape(_LINE_CHUNK, 1)
        sg = sgw_ref[0, pl.ds(i, 1), :].reshape(_LINE_CHUNK, 1)
        elo = elo_ref[0, pl.ds(i, 1), :].reshape(_LINE_CHUNK, 1)

        live = wn0 > 0.0
        wn0s = jnp.where(live, wn0, 1000.0)
        # line strength S(T) (HITRAN convention)
        boltz = jnp.exp(-c2 * elo * (1.0 / T - 1.0 / tref))
        stim = (1.0 - jnp.exp(-c2 * wn0s / T)) / (
            1.0 - jnp.exp(-c2 * wn0s / tref)
        )
        s = sg * qr * boltz * stim             # [8, 1]

        sigma_g = dopp * wn0s
        inv = 1.0 / (sigma_g * 1.4142135623730951)
        dx = wn_row[None, :] - wn0             # [8, W]
        x = dx * inv
        y = gl * inv + jnp.zeros_like(x)
        prof = _faddeeva_block(x, y, ell, a_coeffs) * (inv * _INV_SQRT_PI)
        if nwidth > 0.0:
            gd = sigma_g * _SQRT_2LN2
            reach = nwidth * jnp.maximum(gd, gl)
            prof = jnp.where(jnp.abs(dx) <= reach, prof, 0.0)
        return acc + s * prof

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((_LINE_CHUNK, W), wn_row.dtype)
    )
    out_ref[0, 0, 0, :] = jnp.sum(acc, axis=0)


def cross_section_pallas(
    tiles,
    T: np.ndarray,
    p_barye: np.ndarray,
    spec,
    nwidth: float = 0.0,
    q_table=None,
    n_terms: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Pallas drop-in for opacity.extinction.cross_section_grid
    (collision broadening mode).  Returns sigma[ncond, n_grid]."""
    from bart_tpu.linelist.molecules import get_molecule
    from bart_tpu.linelist.tips import partition_function

    if spec.mode != "collision":
        raise NotImplementedError("pallas kernel: collision mode only")

    mol = get_molecule(tiles.species)
    mass_g = mol.mass * const.AMU
    diam_cm = mol.diameter * 1e-8
    q_fn = partition_function(tiles.species, q_table)

    T = np.asarray(T, np.float64)
    p = np.asarray(p_barye, np.float64)
    ncond = len(T)

    # host-side per-condition scalars
    h2 = get_molecule("H2")
    he = get_molecule("He")
    coll = (
        spec.q_h2 * ((diam_cm + h2.diameter * 1e-8) / 2) ** 2
        * np.sqrt(1 / mass_g + 1 / (h2.mass * const.AMU))
        + spec.q_he * ((diam_cm + he.diameter * 1e-8) / 2) ** 2
        * np.sqrt(1 / mass_g + 1 / (he.mass * const.AMU))
    )
    gamma_l = (
        np.sqrt(2.0) / const.C_LIGHT / np.sqrt(T * np.pi * const.K_BOLTZ)
        * p * coll
    )
    dopp = (
        np.sqrt(2.0 * np.log(2.0) * const.K_BOLTZ * T / mass_g)
        / const.C_LIGHT / _SQRT_2LN2
    )
    qr = np.asarray(q_fn(jnp.asarray(np.full(ncond, TREF)))) / np.asarray(
        q_fn(jnp.asarray(T))
    )
    scalars = jnp.asarray(
        np.stack([T, qr, dopp, gamma_l], axis=1), jnp.float32
    )

    # Layouts chosen for Mosaic: wn tile rows [nt, 1, W] (lanes = wn);
    # line arrays [nt, L/8, 8] so one sublane row = 8 lines (dynamic
    # sublane indexing is supported; dynamic lane slicing is not)
    nt, L = tiles.wn0.shape
    assert L % _LINE_CHUNK == 0, (L, _LINE_CHUNK)
    wn_tiles = tiles.wn_tiles.astype(jnp.float32)[:, None, :]
    shape38 = (nt, L // _LINE_CHUNK, _LINE_CHUNK)
    wn0 = tiles.wn0.astype(jnp.float32).reshape(shape38)
    sgw = (tiles.s296 * tiles.weight).astype(jnp.float32).reshape(shape38)
    elo = tiles.elower.astype(jnp.float32).reshape(shape38)

    W = wn_tiles.shape[2]
    assert L % _LINE_CHUNK == 0, (L, _LINE_CHUNK)
    ell, a = _weideman_coeffs(n_terms)
    a = tuple(float(v) for v in a)

    kernel = functools.partial(
        _kernel,
        n_chunks=L // _LINE_CHUNK,
        ell=float(ell),
        a_coeffs=a,
        nwidth=float(nwidth),
        c2=float(const.C2),
        tref=float(TREF),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncond, nt),
        in_specs=[
            # index maps receive the scalar-prefetch ref as last arg
            pl.BlockSpec((1, 1, W), lambda c, t, s: (t, 0, 0)),
            pl.BlockSpec((1, L // _LINE_CHUNK, _LINE_CHUNK),
                         lambda c, t, s: (t, 0, 0)),
            pl.BlockSpec((1, L // _LINE_CHUNK, _LINE_CHUNK),
                         lambda c, t, s: (t, 0, 0)),
            pl.BlockSpec((1, L // _LINE_CHUNK, _LINE_CHUNK),
                         lambda c, t, s: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, W), lambda c, t, s: (c, t, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ncond, nt, 1, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, wn_tiles, wn0, sgw, elo)
    return out.reshape(ncond, -1)[:, : tiles.n_grid]
