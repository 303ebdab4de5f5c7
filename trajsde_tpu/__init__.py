"""trajsde_tpu — a TPU-native trajectory-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
TrajSDE reference ("Improving Transferability for Cross-domain Trajectory
Prediction via Neural Stochastic Differential Equation", AAAI'24):

* HiVT-style rotation-invariant graph-attention encoders over dense,
  statically-shaped padded scene batches (no ragged PyG graphs).
* Latent neural-SDE temporal encoder (ODE-RNN over an Euler–Maruyama
  ``lax.scan``) with dual per-domain diffusion nets and an OOD head.
* Latent-SDE trajectory decoder (60-step rollout as a single scan).
* Mixed-domain (nuScenes + Argoverse) temporal-grid data pipeline.
* SPMD data parallelism over a ``jax.sharding.Mesh`` with XLA collectives.

Layout:
  data/      SceneBatch pytree, grid alignment, augmentation, loading
  models/    encoders / aggregator / decoders / prediction models
  ops/       numerical integration (sdeint) + pallas kernels
  parallel/  mesh + sharding + collective helpers
  train/     optimizer, loops, metrics, checkpointing, logging
"""

__version__ = "0.1.0"

from trajsde_tpu.data.scene import SceneBatch  # noqa: F401
