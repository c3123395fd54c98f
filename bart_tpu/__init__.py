"""bart_tpu — TPU-native Bayesian Atmospheric Radiative Transfer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference exosports/BART pipeline (Bayesian exoplanet-atmosphere
retrieval): line-by-line radiative transfer, DEMC/snooker MCMC with all
chains vmapped on-device, and wavenumber-sharded multi-chip execution.
"""

__version__ = "0.1.0"
