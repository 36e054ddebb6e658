"""ngp_pl_tpu — a TPU-native Instant-NGP (NeRF) framework built on JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of kwea123/ngp_pl (PyTorch +
custom CUDA) for TPU hardware:

- the `vren` CUDA extension (ray marching, volume compositing, morton,
  packbits, AABB intersection, distortion loss — /root/reference/models/csrc)
  becomes deterministic, fully-parallel XLA/Pallas ops in `ngp_pl_tpu.ops`
  (prefix-sum compaction instead of atomics, segment scans instead of
  per-ray sequential loops);
- tinycudann's hash-grid encoder + fused MLPs (reference models/networks.py)
  become a JAX hash-encoding op plus bf16 XLA matmuls in
  `ngp_pl_tpu.models.ngp`;
- PyTorch-Lightning's DDP training system (reference train.py) becomes a
  jitted train step sharded over a `jax.sharding.Mesh` in
  `ngp_pl_tpu.training` / `ngp_pl_tpu.parallel`.
"""

__version__ = "0.1.0"

from ngp_pl_tpu.config import NGPConfig, TrainConfig  # noqa: F401
