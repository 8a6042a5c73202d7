"""gyre-tpu: a TPU-native image-generation server.

A from-scratch rebuild of the capabilities of stablecabal/gyre on
JAX/XLA/Pallas: Stability-API-compatible gRPC + REST serving of Stable
Diffusion family engines, with the denoise loop compiled into a single XLA
program and multi-chip scale-out over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
