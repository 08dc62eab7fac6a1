"""stereoformer_tpu — a TPU-native dense stereo-matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch repo Magicboomliu/StereoFormer (see SURVEY.md at the repo root):

- ``ops``      pure functional kernel library (cost volumes, soft-argmin,
               local cost-volume resampling, convex upsample, warping,
               1D correlation pyramids, deformable sampling) with XLA
               reference implementations and Pallas TPU kernels behind the
               same API.
- ``nn``       Flax modules (ResBlock, FPN fusion, ConvGRU, guidance /
               update blocks, RAFT encoders).
- ``models``   model zoo: the LowCNN family (fixed / variance / learned /
               GRU local cost volumes) and RAFT-Stereo.
- ``data``     list-file datasets (same format as the reference
               ``filenames/``), PFM/PNG IO, augmentations with explicit
               PRNG, host-side prefetch.
- ``losses``   sequence / multi-scale / range losses and EPE/D1/P1 metrics.
- ``train``    jitted SPMD train/eval steps, optax optimizers, orbax
               checkpoints.
- ``parallel`` device-mesh construction and sharding helpers.

Everything under jit uses static shapes and compiler-friendly control flow;
scaling is expressed with ``jax.sharding`` over a ``Mesh`` so XLA schedules
the collectives (no hand-written communication backend).
"""

__version__ = "0.1.0"
