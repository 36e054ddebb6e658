"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Replaces the tinycudann `Grid/Hash` encoding the reference uses as its field
backbone (reference models/networks.py:36-56: L=16 levels, F=2 features,
T=2**19 table, N_min=16, per-level scale b, linear interpolation).

TPU redesign — the brick layout
-------------------------------
tinycudann gathers 8 independent corner entries per (sample, level) with CUDA
gather hardware and accumulates gradients with atomics.  On TPU, narrow
random access costs ~5ns per element no matter what (no gather hardware), but
*row-granularity* gather/scatter of >=256-byte rows runs at memory speed
(~450 GB/s, measured; the per-index cost is flat up to 512-byte rows).  So
the table is organized so one wide row serves a whole sample:

- Each level is a grid of **bricks of 2x2x2 cells**.  A brick row stores the
  brick's full 3x3x3 corner-point grid (incl. +1 apron) x F features =
  54 floats, padded to 64 (one 256-byte row).
- Any sample's 8 trilinear corners lie *inside one brick row*: encoding a
  sample costs exactly ONE row gather per level (L gathers/sample total,
  vs 8L narrow gathers), and the backward is ONE row scatter-add per
  (sample, level) — both on the fast path.
- Coarse levels whose brick grid fits the budget are stored dense (exact);
  finer levels hash the brick coordinate with the Instant-NGP spatial primes.
  Collisions happen at brick granularity instead of corner granularity —
  same parameter budget (~0.84x entries of T=2^19 at S=2^14 bricks), same
  role; per-level capacity is tunable via `log2_bricks`.
- Interpolation is a lane-local one-hot weighted reduction over the 64-wide
  row (pure VPU, fuses into the gather consumer); JAX autodiff of this graph
  emits exactly the wide row scatter-add for the table gradient — no custom
  VJP needed.

Gradients w.r.t. the input positions flow through the trilinear weights via
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

BRICK_CELLS = 2          # cells per brick edge
BRICK_PTS = BRICK_CELLS + 1   # corner points per edge (3x3x3 = 27)
ROW_PAD = 64             # padded row width (27 pts * F=2 -> 54 -> 64)


@dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of the multiresolution brick table (jit-safe)."""

    n_levels: int
    n_features: int
    log2_bricks: int               # hashed-level brick-slot budget S = 2**lb
    resolutions: Tuple[int, ...]   # R_l: cells per axis at level l
    brick_grids: Tuple[int, ...]   # bricks per axis at level l (= ceil(R/2))
    offsets: Tuple[int, ...]       # start row of each level in the table
    sizes: Tuple[int, ...]         # rows per level (dense: B^3, else S)
    row_width: int = ROW_PAD

    @property
    def total_rows(self) -> int:
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
    log2_bricks: int | None = None,
) -> HashGridSpec:
    """log2_hashmap_size is the reference's corner-entry budget (T=2^19);
    the equivalent brick budget is S = T / 27 rounded to a power of two
    (2^19 -> 2^14) unless log2_bricks overrides it."""
    if n_features != 2:
        raise NotImplementedError("brick layout is tuned for F=2")
    if log2_bricks is None:
        log2_bricks = max(1, log2_hashmap_size - 5)   # T/32 ~= T/27
    S = 2 ** log2_bricks
    # dense while the brick grid fits in 2*S rows (dense storage is exact and
    # cheap at coarse levels; 2x budget keeps level ~R=64 collision-free)
    dense_budget = 2 * S
    resolutions, brick_grids, offsets, sizes = [], [], [], []
    off = 0
    for l in range(n_levels):
        R = int(math.floor(base_resolution * (per_level_scale ** l)))
        B = (R + BRICK_CELLS - 1) // BRICK_CELLS
        dense = B ** 3
        size = dense if dense <= dense_budget else S
        resolutions.append(R)
        brick_grids.append(B)
        offsets.append(off)
        sizes.append(size)
        off += size
    return HashGridSpec(
        n_levels=n_levels,
        n_features=n_features,
        log2_bricks=log2_bricks,
        resolutions=tuple(resolutions),
        brick_grids=tuple(brick_grids),
        offsets=tuple(offsets),
        sizes=tuple(sizes),
    )


def init_hash_table(key, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching tinycudann's hash-table default.
    Shape (total_rows, 64); lanes >= 54 are dead padding (kept at 0)."""
    t = jax.random.uniform(
        key, (spec.total_rows, spec.row_width), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )
    lane = jnp.arange(spec.row_width)
    used = BRICK_PTS ** 3 * spec.n_features
    return jnp.where(lane[None, :] < used, t, 0.0)


# static (8, 3) corner offset pattern
_CORNERS = np.stack([(np.arange(8) >> 0) & 1, (np.arange(8) >> 1) & 1,
                     (np.arange(8) >> 2) & 1], axis=-1)


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
      table: (total_rows, 64) parameter table.
      spec: static grid geometry.

    Returns:
      (N, L*F) features, fp32.
    """
    N = x.shape[0]
    L, F = spec.n_levels, spec.n_features
    x = jnp.clip(x, 0.0, 1.0)

    res = jnp.asarray(spec.resolutions, jnp.float32)            # (L,)
    res_i = jnp.asarray(spec.resolutions, jnp.int32)
    bgrid = jnp.asarray(spec.brick_grids, jnp.int32)            # (L,)
    level_off = jnp.asarray(spec.offsets, jnp.int32)
    level_size = jnp.asarray(spec.sizes, jnp.uint32)
    dense_mask = jnp.asarray(
        [spec.sizes[l] == spec.brick_grids[l] ** 3 for l in range(L)])

    pos = x[:, None, :] * res[None, :, None]                    # (N, L, 3)
    cell = jnp.floor(pos)
    frac = (pos - cell).astype(jnp.float32)                     # (N, L, 3)
    cell = jnp.clip(cell.astype(jnp.int32), 0, res_i[None, :, None] - 1)

    brick = cell >> 1                                           # (N, L, 3)
    local = cell & 1                                            # (N, L, 3)

    bu = brick.astype(jnp.uint32)
    hashed = (
        bu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ bu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ bu[..., 2] * jnp.uint32(_PRIMES[2])
    ) % level_size[None, :]
    dense = ((brick[..., 0] * bgrid[None, :] + brick[..., 1])
             * bgrid[None, :] + brick[..., 2])
    slot = jnp.where(dense_mask[None, :], dense, hashed.astype(jnp.int32))

    # Gather per level from a static slice of the table.  The whole stacked
    # table (~56 MB fp32) exceeds VMEM, and XLA's scatter-add (the backward
    # of this gather) is ~2x slower against HBM-resident operands; slicing
    # keeps each level's scatter target <= 4 MB (VMEM-resident fast path).
    # The slice VJP (pad) is a cheap dense op.
    rows = jnp.stack(
        [table[spec.offsets[l]:spec.offsets[l] + spec.sizes[l]][slot[:, l]]
         for l in range(L)],
        axis=1,
    )                                                           # (N, L, 64)

    # Trilinear blend as one fused 64-lane expression.  The per-point weight
    # factorizes per axis: point coordinate p in {0,1,2} gets weight
    # (p == local) * (1 - frac) + (p == local + 1) * frac.  Each lane's point
    # coordinates (cx, cy, cz) are compile-time constants, so the whole
    # weight row is 12 elementwise ops on (N, L, 64) — no per-corner
    # intermediates, everything 64-lane-minor.
    W = spec.row_width
    lane_id = np.arange(W)
    p = np.minimum(lane_id // F, BRICK_PTS ** 3 - 1)
    cx = jnp.asarray(p // 9, jnp.int32)                          # (64,)
    cy = jnp.asarray((p // 3) % 3, jnp.int32)
    cz = jnp.asarray(p % 3, jnp.int32)

    def axis_w(c_lane, local_a, frac_a):
        # (N, L, 1) local/frac vs (64,) lane constants
        return ((c_lane[None, None, :] == local_a[..., None])
                * (1.0 - frac_a[..., None])
                + (c_lane[None, None, :] == local_a[..., None] + 1)
                * frac_a[..., None])

    lane_valid = jnp.asarray(lane_id < BRICK_PTS ** 3 * F, jnp.float32)
    wrow = (axis_w(cx, local[..., 0], frac[..., 0])
            * axis_w(cy, local[..., 1], frac[..., 1])
            * axis_w(cz, local[..., 2], frac[..., 2])
            * lane_valid[None, None, :])                        # (N, L, 64)
    prod = rows.astype(jnp.float32) * wrow
    lane_f = jnp.asarray(lane_id % F, jnp.int32)
    feats = [jnp.sum(prod * (lane_f == f)[None, None, :], axis=-1)
             for f in range(F)]                                 # F x (N, L)
    return jnp.stack(feats, axis=-1).reshape(N, L * F)


def hash_encode_pointwise(
    x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Reference implementation: explicit 8-corner gather from the same brick
    table (slow narrow-gather path; used by tests to validate hash_encode)."""
    N = x.shape[0]
    L, F = spec.n_levels, spec.n_features
    x = jnp.clip(x, 0.0, 1.0)
    out = []
    for l in range(L):
        R = spec.resolutions[l]
        B = spec.brick_grids[l]
        S = spec.sizes[l]
        dense = S == B ** 3
        pos = x * R
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 1)
        frac = pos - jnp.floor(pos)
        feat = jnp.zeros((N, F), jnp.float32)
        for c in range(8):
            d = jnp.asarray(_CORNERS[c], jnp.int32)
            cc = cell + d[None, :]
            brick = cell >> 1
            ptl = cc - (brick << 1)
            if dense:
                slot = (brick[:, 0] * B + brick[:, 1]) * B + brick[:, 2]
            else:
                bu = brick.astype(jnp.uint32)
                slot = ((bu[:, 0] * jnp.uint32(_PRIMES[0])
                         ^ bu[:, 1] * jnp.uint32(_PRIMES[1])
                         ^ bu[:, 2] * jnp.uint32(_PRIMES[2]))
                        % jnp.uint32(S)).astype(jnp.int32)
            p_idx = (ptl[:, 0] * 3 + ptl[:, 1]) * 3 + ptl[:, 2]
            w = jnp.prod(
                jnp.where(jnp.asarray(_CORNERS[c], jnp.float32)[None] > 0.5,
                          frac, 1.0 - frac), axis=-1)
            row = table[slot + spec.offsets[l]]                # (N, 64)
            vals = jnp.take_along_axis(
                row, p_idx[:, None] * F + jnp.arange(F)[None, :], axis=1)
            feat = feat + w[:, None] * vals.astype(jnp.float32)
        out.append(feat)
    return jnp.concatenate(out, axis=-1)
