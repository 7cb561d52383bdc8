"""SmokePhysAI-TPU: a TPU-native (JAX/XLA/Pallas/pjit) physics-informed
smoke simulation + chaos-feature learning framework.

Re-designed from scratch with the capabilities of MengAiDev/SmokePhysAI
(reference layer map: SURVEY.md §1). The compute path is functional JAX
(pure pytree state, explicit PRNG keys, `lax.scan` time stepping, Pallas
TPU kernels for the stencil/attention hot loops) rather than a port of
the reference's eager PyTorch modules.

Public surface (mirrors reference `src/` packages):
  physics  - Navier-Stokes grid solver, fractal perturbation, chaos features
             (reference: src/physics/)
  models   - SmokePhysNet, ChaosAttention, physics regularizer losses
             (reference: src/models/)
  data     - on-device synthetic episode generation + array cache
             (reference: src/utils/data_loader.py)
  eval     - robustness metrics + perturbation tests (reference: src/evaluation/)
  parallel - mesh / sharding / halo exchange / ring attention (new; absent in
             the single-GPU reference, SURVEY.md §2.6)
  ops      - Pallas TPU kernels (new; reference has zero native code)
  train    - training loop, checkpointing, metrics (reference: train.py)
"""

__version__ = "0.1.0"
