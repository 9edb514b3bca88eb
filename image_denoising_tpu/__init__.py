"""image_denoising_tpu — TPU-native (JAX/XLA/Pallas) SEM image-denoising framework.

A ground-up rebuild of the capability surface of the PyTorch reference
``lmh9507/image_denoising`` (see SURVEY.md at the repo root), designed TPU-first:

* NHWC functional models (flax.linen) jitted end to end,
* one-shot batched tiled inference with on-device window blending instead of
  per-tile host round trips,
* SPMD data / tile parallelism via ``jax.sharding`` meshes,
* counter-seeded ``jax.random`` keys reproducing the reference's per-op
  generator scheme,
* a ``.pth`` import shim for bit-level parity testing against the reference.
"""

__version__ = "0.1.0"
