"""Morton (Z-order) encode/decode in pure jnp bit ops.

Replaces the reference CUDA kernels `morton3D` / `morton3D_invert`
(reference models/csrc/raymarching.cu:35-119).  The reference stores its
density grid Morton-ordered because the CUDA marcher benefits from locality;
the TPU framework keeps the grid in plain row-major (x, y, z) layout for the
hot path and uses these only for reference-layout interop (checkpoint
conversion, parity tests).
"""
from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each uint32 3 apart (raymarching.cu:36-43)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int coords (each < 1024) -> (...) uint32 Morton codes."""
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return xx | (yy << 1) | (zz << 2)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _expand_bits (raymarching.cu:53-61)."""
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """(...) Morton codes -> (..., 3) int32 coords."""
    idx = indices.astype(jnp.uint32)
    return jnp.stack(
        [
            _compact_bits(idx >> 0),
            _compact_bits(idx >> 1),
            _compact_bits(idx >> 2),
        ],
        axis=-1,
    ).astype(jnp.int32)
