"""nerfart_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of NeRF-Art.

Text-driven stylization of pre-trained neural SDF radiance fields:
three neural implicit-surface frameworks (VolSDF, NeuS, UNISURF) plus a
CLIP-driven stylization fine-tuning stage, re-designed TPU-first:

- All hot paths are single jitted programs over megabatches of rays with
  static shapes (no per-ray Python control flow, no serial chunk loops on
  the host: chunking is `lax.map` inside jit).
- Multi-chip scaling via `jax.sharding.Mesh` + NamedSharding over the ray
  axis (data parallel, the parallelism the reference implements with
  DataParallel/DDP, cf. reference train.py / utils/dist_util.py).
- Optional Pallas fused kernels for the SDF/radiance MLP inner loop.

Reference behavior is documented per module with `reference file:line`
citations (reference: cassiePython/NeRF-Art).
"""

__version__ = "0.1.0"
