"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Replaces the tinycudann `Grid/Hash` encoding the reference uses as its field
backbone (reference models/networks.py:36-56: L=16 levels, F=2 features,
T=2**19 table, N_min=16, per-level scale b, linear interpolation).

Design notes (vs the CUDA original):
- One flat fp32 parameter table holds all levels back-to-back with static
  per-level offsets; levels whose dense corner grid fits in T entries are
  stored dense (no hashing, no collisions), exactly like tinycudann.
- Forward = one fused gather of 8 corners x L levels + trilinear blend;
  backward = XLA scatter-add into the table (the same pattern as an LM
  embedding backward, which XLA:TPU handles natively) — no atomics.
- Everything is shaped (N, L, 8, F) so XLA can fuse the interpolation
  arithmetic into the gather/scatter; the table stays fp32 (gradient
  accumulation precision), activations are cast by the caller.
- Gradients w.r.t. the input positions flow through the trilinear weights via
  autodiff (needed for camera-pose refinement, reference train.py:117-122).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial hash primes (pi_1 = 1 implicitly on x).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of the multiresolution table (hashable, jit-safe)."""

    n_levels: int
    n_features: int
    hashmap_size: int           # T
    resolutions: Tuple[int, ...]   # R_l: cells per axis at level l
    offsets: Tuple[int, ...]       # start entry of each level in the flat table
    sizes: Tuple[int, ...]         # entries per level (dense: (R_l+1)^3, else T)

    @property
    def total_entries(self) -> int:
        return self.offsets[-1] + self.sizes[-1]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_grid_spec(
    n_levels: int = 16,
    n_features: int = 2,
    log2_hashmap_size: int = 19,
    base_resolution: int = 16,
    per_level_scale: float = 1.3819,
) -> HashGridSpec:
    T = 2 ** log2_hashmap_size
    resolutions, offsets, sizes = [], [], []
    off = 0
    for l in range(n_levels):
        R = int(math.floor(base_resolution * (per_level_scale ** l)))
        dense = (R + 1) ** 3
        size = dense if dense <= T else T
        # align level starts to 8 entries to keep gathers tidy
        resolutions.append(R)
        offsets.append(off)
        sizes.append(size)
        off += size
    return HashGridSpec(
        n_levels=n_levels,
        n_features=n_features,
        hashmap_size=T,
        resolutions=tuple(resolutions),
        offsets=tuple(offsets),
        sizes=tuple(sizes),
    )


def init_hash_table(key, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching tinycudann's hash-table default."""
    return jax.random.uniform(
        key, (spec.total_entries, spec.n_features), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _corner_indices(spec: HashGridSpec) -> np.ndarray:
    """(8, 3) corner offset pattern, static."""
    c = np.arange(8)
    return np.stack([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1], axis=-1)


@partial(jax.jit, static_argnames=("spec",))
def hash_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    spec: HashGridSpec,
) -> jnp.ndarray:
    """Encode positions.

    Args:
      x: (N, 3) positions in [0, 1]^3 (caller normalizes by the scene box,
         reference models/networks.py:103).
      table: (total_entries, F) fp32 parameter table.
      spec: static grid geometry.

    Returns:
      (N, L*F) features (same dtype as table).
    """
    N = x.shape[0]
    L, F = spec.n_levels, spec.n_features
    x = jnp.clip(x, 0.0, 1.0)

    res = jnp.asarray(spec.resolutions, jnp.float32)         # (L,)
    level_off = jnp.asarray(spec.offsets, jnp.uint32)        # (L,)
    level_size = jnp.asarray(spec.sizes, jnp.uint32)         # (L,)
    res_i = jnp.asarray(spec.resolutions, jnp.int32)
    dense_mask = jnp.asarray(
        [((r + 1) ** 3) <= spec.hashmap_size for r in spec.resolutions]
    )                                                        # (L,) bool

    pos = x[:, None, :] * res[None, :, None]                 # (N, L, 3)
    cell = jnp.floor(pos)
    frac = pos - cell                                        # (N, L, 3)
    cell = cell.astype(jnp.int32)                            # (N, L, 3)

    corners = jnp.asarray(_corner_indices(spec), jnp.int32)  # (8, 3)
    # corner integer coords, clamped to the grid: (N, L, 8, 3)
    cc = jnp.clip(
        cell[:, :, None, :] + corners[None, None, :, :],
        0,
        res_i[None, :, None, None],
    )
    ccu = cc.astype(jnp.uint32)

    # hashed index (instant-ngp spatial hash) vs dense row-major index
    hashed = (
        ccu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ ccu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ ccu[..., 2] * jnp.uint32(_PRIMES[2])
    ) % level_size[None, :, None]
    stride = (res_i + 1).astype(jnp.uint32)                  # (L,)
    dense = (
        ccu[..., 0]
        + stride[None, :, None] * (ccu[..., 1] + stride[None, :, None] * ccu[..., 2])
    )
    idx = jnp.where(dense_mask[None, :, None], dense, hashed)
    idx = (idx + level_off[None, :, None]).astype(jnp.int32)  # (N, L, 8)

    feats = table[idx.reshape(-1)].reshape(N, L, 8, F)

    # trilinear weights: prod over axes of (1-frac) or frac per corner bit
    cb = corners.astype(jnp.float32)                          # (8, 3)
    w = jnp.prod(
        jnp.where(cb[None, None, :, :] > 0.5,
                  frac[:, :, None, :],
                  1.0 - frac[:, :, None, :]),
        axis=-1,
    )                                                         # (N, L, 8)
    out = jnp.sum(feats * w[..., None].astype(table.dtype), axis=2)  # (N, L, F)
    return out.reshape(N, L * F)
