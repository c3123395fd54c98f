"""Gray cloud models.

Equivalent of the reference's cloud flags (reference:
code/BARTfunc.py:353-354 set_cloudtop; makecfg.py known_args
cloudrad/cloudfct/cloudext — SURVEY.md section 2.2):

* ``cloudtop``: opaque gray deck below a top pressure [bar] — the
  fitted retrieval parameter.  Implemented as a steep but smooth
  (differentiable) extinction ramp in log-pressure so gradients flow.
* ``cloudext``: constant gray extinction [cm-1] applied over an
  extended region (cloud deck with finite extinction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cloud_deck_extinction", "gray_extinction",
           "extended_cloud_extinction"]

# Extinction amplitude inside the opaque deck [cm-1]: tau across one
# layer >> toomuch for any realistic layer thickness.
_DECK_KAPPA = 1.0e2
# Transition width of the deck top in dex of pressure.
_DECK_WIDTH_DEX = 0.05


def cloud_deck_extinction(
    pressure_bar: jax.Array, log10_p_top, nwave: int
) -> jax.Array:
    """Opaque-deck extinction [cm-1] per (layer, wn).

    ``log10_p_top`` is log10 of the cloud-top pressure in bar (the
    retrieval parameter; reference passes the raw cloudtop value —
    bart_tpu's driver converts).  Layers below the top get extinction
    _DECK_KAPPA via a smooth sigmoid ramp of width _DECK_WIDTH_DEX.
    """
    x = (jnp.log10(pressure_bar) - log10_p_top) / _DECK_WIDTH_DEX
    profile = _DECK_KAPPA * jax.nn.sigmoid(x)
    return jnp.broadcast_to(profile[:, None], (pressure_bar.shape[0], nwave))


def extended_cloud_extinction(
    rad_km: jax.Array, r_top_km, r_bot_km, kappa
) -> jax.Array:
    """Extended gray cloud per layer [cm-1] (reference transit flags
    cloudrad/cloudfct/cloudext — makecfg.py:36-52 known_args;
    SURVEY.md section 2.2 "cloud + scattering"): extinction ramps
    linearly from 0 at the cloud-top radius ``r_top_km`` to ``kappa``
    at the cloud-bottom radius ``r_bot_km`` and stays ``kappa`` below.
    Differentiable in the radii via the linear ramp."""
    ramp = (r_top_km - rad_km) / jnp.maximum(r_top_km - r_bot_km, 1e-12)
    return kappa * jnp.clip(ramp, 0.0, 1.0)


def gray_extinction(
    pressure_bar: jax.Array, p_lo_bar, p_hi_bar, kappa, nwave: int
) -> jax.Array:
    """Constant gray extinction ``kappa`` [cm-1] between two pressures
    (reference cloudrad/cloudext extended cloud)."""
    inside = (pressure_bar >= p_lo_bar) & (pressure_bar <= p_hi_bar)
    profile = jnp.where(inside, kappa, 0.0)
    return jnp.broadcast_to(profile[:, None], (pressure_bar.shape[0], nwave))
