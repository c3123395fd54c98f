"""Fused eclipse forward kernel (Pallas TPU).

The gridded-opacity eclipse hot path (reference SURVEY.md 3.2: opacity
interpolation at the sampled T -> extinction -> vertical tau -> Planck
-> emergent flux, i.e. the body of transit's ``run_transit`` for the
eclipse geometry) as ONE Pallas kernel.

The unfused XLA pipeline materializes, per chain batch, the
interpolated cross-sections [chain, mol, layer, wn], the extinction
[chain, layer, wn], the optical depth [chain, layer, wn], and the
mu-attenuation — ~15 GB of HBM traffic per 512-chain batch at demo
scale, making the forward model bandwidth-bound.  This kernel streams
the LAYER axis instead: for each (wavenumber tile, chain block)
program, a fori_loop walks the 100 layers keeping only [chains, tile]
rows live in VMEM —

    ext_l  = (interp weights x number density) @ sigma[l]   (MXU)
    tau_l  = tau_{l-1} + 0.5 (ext_{l-1} + ext_l) dr_l       (VPU)
    B_l    = Planck(T_l, wn)                                (VPU)
    S_l    = sum_k w_k mu_k exp(-tau_l / mu_k)              (VPU)
    F     += 0.5 (B_{l-1} + B_l) (S_{l-1} - S_l)            (VPU)

with the closing boundary term F += B_bot S_bot (the exact isothermal
limit, matching rt.eclipse.eclipse_intensity's summation form).  HBM
traffic drops to the opacity-table tile + per-chain profiles + the
output spectrum — two orders of magnitude less than the unfused path.

The public entry ``eclipse_spectrum_gridded`` is a
``jax.custom_batching.custom_vmap``: called per-sample (the
ForwardModel/`Likelihood` contract) it runs the reference jnp math;
under ``vmap`` (every sampler batches chains this way) the whole batch
is dispatched to the Pallas kernel on TPU, or to the vmapped jnp path
on other backends.  Numerics are f32 in both paths with the same
operation order per layer, so the kernel is a drop-in for the hot loop
while `ForwardModel.diagnostics` keeps the unfused path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bart_tpu import constants as const
from bart_tpu.rt.tau import TAU_CLAMP

__all__ = ["eclipse_spectrum_gridded"]

_C1 = 2.0 * const.H_PLANCK * const.C_LIGHT**2   # 2 h c^2
_VMEM_BUDGET = 10 * 2**20                        # leave headroom of 16 MB

# test hook: None = auto (TPU -> pallas), True/False force
FORCE_PALLAS: bool | None = None
# set by tests to run the kernel in interpreter mode off-TPU
INTERPRET: bool = False


def _interp_weights(sigma_nt, t_min, t_step, T):
    """Linear-in-T interpolation weights w[..., L, nT] (identical
    bracketing/clamping to opacity.grid.interp_opacity)."""
    x = (T - t_min) / t_step
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, sigma_nt - 2)
    f = jnp.clip(x - i0, 0.0, 1.0)
    t_iota = jnp.arange(sigma_nt)
    shape = T.shape + (sigma_nt,)
    w = jnp.where(t_iota == i0[..., None], 1.0 - f[..., None], 0.0)
    w = jnp.where(t_iota == i0[..., None] + 1, w + f[..., None], w)
    return w


def _single(sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp):
    """Reference jnp path, one sample (same math as
    opacity.grid.interp_opacity + rt.tau.tau_vertical +
    rt.eclipse.eclipse_flux)."""
    from bart_tpu.rt.eclipse import eclipse_flux

    nT = sigma.shape[1]
    w = _interp_weights(nT, t_min, t_step, T)                 # [L, nT]
    sig = jnp.einsum("lt,mtlw->mlw", w, sigma,
                     precision=jax.lax.Precision.HIGHEST)
    ext = jnp.einsum("mlw,ml->lw", sig, n_mol,
                     precision=jax.lax.Precision.HIGHEST)
    seg = 0.5 * (ext[:-1] + ext[1:]) * drp[1:, None]
    tri = jnp.tril(jnp.ones((seg.shape[0], seg.shape[0]), seg.dtype))
    tau = jax.lax.dot_general(
        tri, seg, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    tau = jnp.concatenate([jnp.zeros_like(tau[:1]), tau], axis=0)
    return eclipse_flux(tau, T, wn, mu, muw)


def _kernel(tab_ref, wnm_ref, aux_ref, wn_ref, minv_ref, wmu_ref,
            out_ref, *, L, nmu):
    """One (wn tile, chain block) program; layer-streaming loop.

    aux_ref packs per-(layer, chain) scalars [L, CB, 2]:
    lane 0 = temperature, lane 1 = radius segment dr_{l-1,l} [cm]
    (Mosaic requires the lane dim of a block to be a 128-multiple or
    the full array dim — two packed lanes satisfy that where separate
    [L, CB] blocks cannot once CB < 128).
    """
    wn_row = wn_ref[0, :]                                     # [W]
    wn3 = (_C1 * wn_row * wn_row * wn_row)[None, :]           # [1, W]
    c2wn = (const.C2 * wn_row)[None, :]

    def planck(T_col):                                        # [CB,1] -> [CB,W]
        # exp(x)-1 instead of expm1 (no Pallas-TPU lowering); x >= 0.4
        # for any IR retrieval grid, so no cancellation in f32.
        return wn3 / (jnp.exp(c2wn / T_col) - 1.0)

    def smix(tau):                                            # [CB,W] -> [CB,W]
        tau_c = jnp.minimum(tau, TAU_CLAMP)
        acc = jnp.zeros_like(tau)
        for k in range(nmu):
            acc = acc + wmu_ref[0, k] * jnp.exp(-tau_c * minv_ref[0, k])
        return acc

    def ext_at(layer):                                        # [CB,W]
        return jax.lax.dot_general(
            wnm_ref[layer], tab_ref[layer],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    ext0 = ext_at(0)
    tau0 = jnp.zeros_like(ext0)
    B0 = planck(aux_ref[0][:, 0:1])
    S0 = smix(tau0)
    flux0 = jnp.zeros_like(ext0)

    def body(layer, carry):
        ext_p, tau_p, B_p, S_p, flux = carry
        aux_l = aux_ref[layer]
        ext_l = ext_at(layer)
        tau_l = tau_p + 0.5 * (ext_p + ext_l) * aux_l[:, 1:2]
        B_l = planck(aux_l[:, 0:1])
        S_l = smix(tau_l)
        flux = flux + 0.5 * (B_p + B_l) * (S_p - S_l)
        return ext_l, tau_l, B_l, S_l, flux

    _, _, B_b, S_b, flux = jax.lax.fori_loop(
        1, L, body, (ext0, tau0, B0, S0, flux0)
    )
    out_ref[:, :] = 2.0 * jnp.pi * (flux + B_b * S_b)


def _pick_blocks(L, mnt, c_pad, w_pad):
    """(tile, chain block) sizes.  Pallas double-buffers every input
    block, the layer loop carries five [cb, tile] rows, and Mosaic pads
    the mnt axis to 32 lanes — budget conservatively."""
    mnt32 = -(-mnt // 32) * 32
    tile = 256
    while tile > 128 and 2 * L * mnt32 * tile * 4 > _VMEM_BUDGET // 3:
        tile //= 2
    cb = 128
    while cb > 8 and (2 * L * cb * mnt32 * 4 + 8 * cb * tile * 4
                      > _VMEM_BUDGET // 3 or cb > c_pad):
        cb //= 2
    return min(tile, w_pad), min(cb, c_pad)


def _pallas_batch(sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp):
    """Batched Pallas dispatch: T [C, L], n_mol [C, M, L], drp [C, L]."""
    f32 = jnp.float32
    M, nT, L, W = sigma.shape
    C = T.shape[0]
    nmu = int(mu.shape[0])
    mnt = M * nT

    w_int = _interp_weights(nT, t_min, t_step, T.astype(f32))  # [C, L, nT]
    # fold number densities into the interp weights: ext = wnm @ tab
    nm = jnp.transpose(n_mol.astype(f32), (0, 2, 1))           # [C, L, M]
    wnm = (w_int[:, :, None, :] * nm[:, :, :, None]).reshape(C, L, mnt)

    # pad the wn axis to a tile multiple and chains to a block multiple
    tile, cb = _pick_blocks(L, mnt, max(C, 8), max(W, 128))
    w_pad = -(-W // tile) * tile
    c_pad = -(-C // cb) * cb
    tab = jnp.transpose(sigma.astype(f32), (2, 0, 1, 3)).reshape(L, mnt, W)
    tab = jnp.pad(tab, ((0, 0), (0, 0), (0, w_pad - W)))
    wn_p = jnp.pad(wn.astype(f32), (0, w_pad - W), constant_values=1.0)

    wnm_t = jnp.pad(jnp.transpose(wnm, (1, 0, 2)),
                    ((0, 0), (0, c_pad - C), (0, 0)))          # [L, Cp, mnt]
    aux = jnp.stack([T.astype(f32), drp.astype(f32)], axis=-1) # [C, L, 2]
    aux_t = jnp.pad(jnp.transpose(aux, (1, 0, 2)),
                    ((0, 0), (0, c_pad - C), (0, 0)),
                    constant_values=1000.0)                    # [L, Cp, 2]

    grid = (w_pad // tile, c_pad // cb)
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, nmu=nmu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, mnt, tile), lambda i, j: (0, 0, i)),
            pl.BlockSpec((L, cb, mnt), lambda i, j: (0, j, 0)),
            pl.BlockSpec((L, cb, 2), lambda i, j: (0, j, 0)),
            pl.BlockSpec((1, tile), lambda i, j: (0, i)),
            pl.BlockSpec((1, nmu), lambda i, j: (0, 0)),
            pl.BlockSpec((1, nmu), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((cb, tile), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((c_pad, w_pad), f32),
        interpret=INTERPRET,
    )(
        tab, wnm_t, aux_t, wn_p[None, :],
        (1.0 / mu.astype(f32))[None, :],
        (muw.astype(f32) * mu.astype(f32))[None, :],
    )
    return out[:C, :W]


@jax.custom_batching.custom_vmap
def eclipse_spectrum_gridded(sigma, wn, mu, muw, t_min, t_step,
                             T, n_mol, drp):
    """Eclipse flux F[wn] from the opacity grid, one sample.

    sigma [mol, nT, layer, wn] cm^2/molecule; T [layer] K;
    n_mol [mol, layer] cm^-3; drp [layer] cm with drp[0] == 0
    (drp[l] = r_{l-1} - r_l).  Under ``vmap`` over (T, n_mol, drp) the
    batch runs as one fused Pallas kernel on TPU.
    """
    return _single(sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp)


@eclipse_spectrum_gridded.def_vmap
def _es_vmap(axis_size, in_batched, sigma, wn, mu, muw, t_min, t_step,
             T, n_mol, drp):
    tb, nb, db = in_batched[6], in_batched[7], in_batched[8]
    if any(in_batched[:6]) or not (tb and nb and db):
        # tables batched (never happens in the samplers) — fall back
        axes = tuple(0 if b else None for b in in_batched)
        return jax.vmap(_single, in_axes=axes)(
            sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp), True

    use_pallas = FORCE_PALLAS
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        out = _pallas_batch(sigma, wn, mu, muw, t_min, t_step,
                            T, n_mol, drp).astype(T.dtype)
    else:
        out = jax.vmap(
            _single, in_axes=(None,) * 6 + (0, 0, 0)
        )(sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp)
    return out, True
