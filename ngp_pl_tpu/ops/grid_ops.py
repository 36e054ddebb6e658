"""Density-grid bit packing (reference models/csrc/raymarching.cu:122-161).

The reference packs the thresholded density grid into a uint8 bitfield
(8 cells/byte) because its CUDA marcher reads single bytes.  The TPU marcher
consumes a plain uint8 occupancy array (one byte per cell) — gathers of bytes
are what the hardware does anyway and it skips the bit arithmetic in the hot
path — but we keep `packbits`/`unpackbits` for reference checkpoint interop
and to mirror the reference's memory format in the saved bitfield.
"""
from __future__ import annotations

import jax.numpy as jnp


def packbits(density_grid: jnp.ndarray, threshold) -> jnp.ndarray:
    """Flat density grid (N,) -> bitfield (N//8,) uint8, LSB = first cell."""
    occ = (density_grid.reshape(-1, 8) > threshold).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (occ * weights).sum(axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """(N//8,) uint8 bitfield -> (N,) uint8 occupancy flags in {0, 1}."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[:, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(-1)
