"""TPU-native ops replacing the reference `vren` CUDA extension.

Mapping from the reference pybind registry (reference models/csrc/binding.cpp:234-251):

  ray_aabb_intersect      -> ops.intersection.ray_aabb_intersect
  ray_sphere_intersect    -> ops.intersection.ray_sphere_intersect
  morton3D / _invert      -> ops.morton.morton3d / morton3d_invert
  packbits                -> ops.grid_ops.packbits
  raymarching_train       -> ops.ray_march.march_rays_train
  raymarching_test        -> ops.ray_march.march_rays_chain (round-based test path)
  composite_train_fw/bw   -> ops.volume_render.composite_train (custom_vjp)
  composite_test_fw       -> ops.volume_render.composite_test_round
  distortion_loss_fw/bw   -> ops.distortion.distortion_loss (custom_vjp)

plus the tinycudann replacements:

  hash-grid encoding      -> ops.hash_encoding.hash_encode
  spherical harmonics     -> ops.sh.sh_encode
  TruncExp                -> ops.trunc_exp.trunc_exp
"""

from ngp_pl_tpu.ops.morton import morton3d, morton3d_invert  # noqa: F401
from ngp_pl_tpu.ops.trunc_exp import trunc_exp  # noqa: F401
from ngp_pl_tpu.ops.sh import sh_encode  # noqa: F401
from ngp_pl_tpu.ops.grid_ops import packbits, unpackbits  # noqa: F401
from ngp_pl_tpu.ops.intersection import (  # noqa: F401
    ray_aabb_intersect,
    ray_aabb_intersect_single,
    ray_sphere_intersect,
)
