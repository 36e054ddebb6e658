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
ROW_PAD = 64             # padded row width for F=2 (27 pts * 2 -> 54 -> 64);
                         # F=4 rows pad 108 -> 128 (one native TPU tile row)


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
    (2^19 -> 2^14) unless log2_bricks overrides it.

    F=2 rows are 54 floats padded to 64 lanes; F=4 rows are 108 padded to
    128 — one native TPU tile row, halving the per-row gather/scatter count
    per encoded sample at equal entry budget."""
    if n_features not in (2, 4):
        raise NotImplementedError("brick layout supports F in {2, 4}")
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
        row_width=64 if n_features == 2 else 128,
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


def _slots_local_frac(x, spec: HashGridSpec):
    """Per-(sample, level) GLOBAL table row + in-brick cell + cell fraction.

    x must already be clipped to [0, 1]^3.  Returns
    (slot (N, L) int32 global row ids, local (N, L, 3) int32 in {0, 1},
    frac (N, L, 3) f32)."""
    L = spec.n_levels
    res = jnp.asarray(spec.resolutions, jnp.float32)            # (L,)
    res_i = jnp.asarray(spec.resolutions, jnp.int32)
    bgrid = jnp.asarray(spec.brick_grids, jnp.int32)            # (L,)
    level_off = jnp.asarray(spec.offsets, jnp.int32)
    dense_mask = jnp.asarray(
        [spec.sizes[l] == spec.brick_grids[l] ** 3 for l in range(L)])

    pos = x[:, None, :] * res[None, :, None]                    # (N, L, 3)
    cell = jnp.floor(pos)
    frac = (pos - cell).astype(jnp.float32)                     # (N, L, 3)
    cell = jnp.clip(cell.astype(jnp.int32), 0, res_i[None, :, None] - 1)

    brick = cell >> 1                                           # (N, L, 3)
    local = cell & 1                                            # (N, L, 3)

    bu = brick.astype(jnp.uint32)
    # hashed levels all share the pow-2 budget S, so `% size` is a mask (the
    # dense branch below ignores this value); integer division is slow VPU
    hashed = (
        bu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ bu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ bu[..., 2] * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(2 ** spec.log2_bricks - 1)
    dense = ((brick[..., 0] * bgrid[None, :] + brick[..., 1])
             * bgrid[None, :] + brick[..., 2])
    slot = jnp.where(dense_mask[None, :], dense, hashed.astype(jnp.int32))
    return slot + level_off[None, :], local, frac


# static per-lane point coordinates of the 64-wide brick row
def _lane_consts(spec: HashGridSpec):
    W, F = spec.row_width, spec.n_features
    lane_id = np.arange(W)
    p = np.minimum(lane_id // F, BRICK_PTS ** 3 - 1)
    cx = jnp.asarray(p // 9, jnp.int32)
    cy = jnp.asarray((p // 3) % 3, jnp.int32)
    cz = jnp.asarray(p % 3, jnp.int32)
    lane_valid = jnp.asarray(lane_id < BRICK_PTS ** 3 * F, jnp.float32)
    lane_f = np.asarray(lane_id % F, np.int32)
    return cx, cy, cz, lane_valid, lane_f


def _axis_w(c_lane, local_a, frac_a):
    # (N, L, 1) local/frac vs (W,) lane constants
    return ((c_lane[None, None, :] == local_a[..., None])
            * (1.0 - frac_a[..., None])
            + (c_lane[None, None, :] == local_a[..., None] + 1)
            * frac_a[..., None])


def _axis_dw(c_lane, local_a):
    # d axis_w / d frac_a  (lane constant +-1/0 pattern)
    return ((c_lane[None, None, :] == local_a[..., None] + 1).astype(jnp.float32)
            - (c_lane[None, None, :] == local_a[..., None]))


def _wrow(local, frac, spec: HashGridSpec):
    """(N, L, W) trilinear lane weights.

    The per-point weight factorizes per axis: point coordinate p in {0,1,2}
    gets weight (p == local)(1-frac) + (p == local+1)frac; lane point coords
    are compile-time constants, so this is ~12 fused elementwise ops."""
    cx, cy, cz, lane_valid, _ = _lane_consts(spec)
    return (_axis_w(cx, local[..., 0], frac[..., 0])
            * _axis_w(cy, local[..., 1], frac[..., 1])
            * _axis_w(cz, local[..., 2], frac[..., 2])
            * lane_valid[None, None, :])


def _feats_from_rows(rows, wrow, spec: HashGridSpec):
    N = rows.shape[0]
    L, F = spec.n_levels, spec.n_features
    _, _, _, _, lane_f = _lane_consts(spec)
    prod = rows.astype(jnp.float32) * wrow
    feats = [jnp.sum(prod * jnp.asarray(lane_f == f, jnp.float32)[None, None, :],
                     axis=-1)
             for f in range(F)]                                 # F x (N, L)
    return jnp.stack(feats, axis=-1).reshape(N, L * F)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _hash_encode_cv(spec: HashGridSpec, need_x_grad: bool, x, table):
    rows, wrow, _, _ = _encode_fwd_parts(spec, x, table)
    return _feats_from_rows(rows, wrow, spec)


def _gather_rows_bf16(table, flat_slots):
    """Row gather through a reduced-precision compute copy of the table.

    The 512B-row gather is BANDWIDTH-bound on TPU (measured 4.98 ns/row f32
    vs 2.84 ns/row at 2 bytes) — one cheap 30 MB cast halves the encoder's
    biggest HBM term.  Gradients are unaffected: the cast sits inside the
    custom_vjp, whose backward scatters fp32 into the fp32 master table.

    dtype matters: a bf16 copy (8-bit mantissa) COSTS ~8 dB of PSNR on the
    procedural quality gate (measured round 3: 15.1 vs 23.5 at 1536 steps) —
    the quantization noise floor sits above the fine-level feature scale.
    A float16 copy (10-bit mantissa, tinycudann's table precision,
    reference networks.py:36-56) holds quality, BUT a plain
    `astype(f16)[slots].astype(f32)` makes XLA materialize BOTH the f16
    gather output and its f32 conversion when the consumer is a Pallas
    custom call (+3.2 GB of HBM traffic at bench shapes — measured slower
    than the f32 gather).  The fused encode path therefore uses
    `gather_rows_f16_packed` (swizzled u32 rows decoded inside the kernel);
    this helper keeps the straightforward f32 master gather for the
    remaining (cold) paths."""
    return table[flat_slots]


def _encode_fwd_parts(spec, x, table):
    N = x.shape[0]
    L = spec.n_levels
    W = spec.row_width
    xc = jnp.clip(x, 0.0, 1.0)
    slot, local, frac = _slots_local_frac(xc, spec)
    # ONE merged gather for all levels: a deep gather queue hides the random
    # HBM row latency far better than L separate per-level gathers
    rows = _gather_rows_bf16(table, slot.reshape(-1)).reshape(N, L, W)
    wrow = _wrow(local, frac, spec)
    return rows, wrow, slot, frac


def _hash_encode_fwd(spec, need_x_grad, x, table):
    rows, wrow, slot, _ = _encode_fwd_parts(spec, x, table)
    out = _feats_from_rows(rows, wrow, spec)
    # residuals: x is recomputed into (local, frac); rows are re-gathered only
    # if position gradients are needed (pose refinement)
    return out, (x, slot, table if need_x_grad else None)


def _hash_encode_bwd(spec, need_x_grad, res, g):
    x, slot, table = res
    N = x.shape[0]
    L, F = spec.n_levels, spec.n_features
    W = spec.row_width
    xc = jnp.clip(x, 0.0, 1.0)
    _, local, frac = _slots_local_frac(xc, spec)
    wrow = _wrow(local, frac, spec)
    _, _, _, lane_valid, lane_f = _lane_consts(spec)

    g3 = g.reshape(N, L, F)
    g_lane = jnp.tile(g3, (1, 1, W // F))                       # (N, L, W): lane_f == lane % F
    d_rows = wrow * g_lane                                      # (N, L, W)

    # per-level scatter-adds: each target slice stays <= 4 MB (scatter rate
    # degrades ~2x against large HBM-resident targets, measured)
    parts = []
    for l in range(L):
        parts.append(
            jnp.zeros((spec.sizes[l], W), jnp.float32)
            .at[slot[:, l] - spec.offsets[l]].add(d_rows[:, l]))
    d_table = jnp.concatenate(parts, axis=0)

    if need_x_grad:
        rows = _gather_rows_bf16(table, slot.reshape(-1)).reshape(
            N, L, W).astype(jnp.float32)
        cx, cy, cz, _, _ = _lane_consts(spec)
        rg = rows * g_lane * lane_valid[None, None, :]
        wx = _axis_w(cx, local[..., 0], frac[..., 0])
        wy = _axis_w(cy, local[..., 1], frac[..., 1])
        wz = _axis_w(cz, local[..., 2], frac[..., 2])
        dwx = _axis_dw(cx, local[..., 0])
        dwy = _axis_dw(cy, local[..., 1])
        dwz = _axis_dw(cz, local[..., 2])
        d_frac = jnp.stack([
            jnp.sum(rg * dwx * wy * wz, axis=-1),
            jnp.sum(rg * wx * dwy * wz, axis=-1),
            jnp.sum(rg * wx * wy * dwz, axis=-1),
        ], axis=-1)                                             # (N, L, 3)
        res_f = jnp.asarray(spec.resolutions, jnp.float32)
        in_box = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)    # clip VJP
        d_x = jnp.sum(d_frac * res_f[None, :, None], axis=1) * in_box
    else:
        d_x = jnp.zeros_like(x)
    return d_x, d_table


_hash_encode_cv.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Fused level-major encode + first dense layer — the model's hot path.
#
# Three measured TPU effects motivate this form (all on a v5e):
#   1. level-major gather order (all of level 0's rows, then level 1's, ...)
#      runs ~1.5x faster than sample-major (2.9 vs 4.3 ns/row): consecutive
#      indices point into one table region.
#   2. materializing the (N, L, 64) gathered-rows tensor and reducing it to
#      (N, L*F) features costs more than the gather itself (~40 ms at
#      N=262144); contracting rows directly against the first MLP layer with
#      one multi-dim dot_general keeps everything inside a single
#      gather->multiply->MXU pipeline (16 ms total, 3.7x faster).
#   3. the backward's table scatter must stay per-level (<=4 MB targets
#      scatter at 6.7 ns/row vs 14.7 into the whole table), which plain
#      autodiff of a merged gather would not do — hence custom_vjp.
#
# enc @ W1 is linear, so fusing W1 into the reduction is mathematically
# identical to hash_encode followed by the first matmul (reference
# tinycudann fuses encoding+MLP the same way, networks.py:36-56).
# ---------------------------------------------------------------------------


def _slots_local_frac_lm(x, spec: HashGridSpec):
    """Level-major variant: (L, N) slot, (L, N, 3) local, (L, N, 3) frac."""
    res = jnp.asarray(spec.resolutions, jnp.float32)
    res_i = jnp.asarray(spec.resolutions, jnp.int32)
    bgrid = jnp.asarray(spec.brick_grids, jnp.int32)
    level_off = jnp.asarray(spec.offsets, jnp.int32)
    L = spec.n_levels
    dense_mask = jnp.asarray(
        [spec.sizes[l] == spec.brick_grids[l] ** 3 for l in range(L)])

    pos = x[None, :, :] * res[:, None, None]                    # (L, N, 3)
    cell = jnp.floor(pos)
    frac = (pos - cell).astype(jnp.float32)
    cell = jnp.clip(cell.astype(jnp.int32), 0, res_i[:, None, None] - 1)
    brick = cell >> 1
    local = cell & 1
    bu = brick.astype(jnp.uint32)
    # `% size` -> pow-2 mask; see _slots_local_frac
    hashed = (
        bu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ bu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ bu[..., 2] * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(2 ** spec.log2_bricks - 1)
    dense = ((brick[..., 0] * bgrid[:, None] + brick[..., 1])
             * bgrid[:, None] + brick[..., 2])
    slot = jnp.where(dense_mask[:, None], dense, hashed.astype(jnp.int32))
    return slot + level_off[:, None], local, frac


def _wrow_lm(local, frac, spec: HashGridSpec):
    """(L, N, W) trilinear lane weights (axis helpers are shape-agnostic)."""
    cx, cy, cz, lane_valid, _ = _lane_consts(spec)
    return (_axis_w(cx, local[..., 0], frac[..., 0])
            * _axis_w(cy, local[..., 1], frac[..., 1])
            * _axis_w(cz, local[..., 2], frac[..., 2])
            * lane_valid[None, None, :])


def expand_w1(w1: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """(L*F, H) first-layer weight -> (L, W, H) per-lane form.

    Lane `lane` of level l carries feature `lane % F` of level l, so its
    weight row is w1[l*F + lane%F].  Static-index gather: differentiable,
    and its VJP (a static scatter-add over 32 rows) is negligible."""
    L, F, W = spec.n_levels, spec.n_features, spec.row_width
    idx = np.arange(L)[:, None] * F + (np.arange(W) % F)[None, :]   # (L, W)
    return w1[jnp.asarray(idx.reshape(-1))].reshape(L, W, w1.shape[-1])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _encode_mlp_cv(spec: HashGridSpec, need_x_grad: bool, x, table, w1big):
    out, _ = _encode_mlp_fwd_impl(spec, x, table, w1big)
    return out


def _encode_mlp_fwd_impl(spec, x, table, w1big):
    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    xc = jnp.clip(x, 0.0, 1.0)
    slot, local, frac = _slots_local_frac_lm(xc, spec)
    rows = _gather_rows_bf16(table, slot.reshape(-1)).reshape(L, N, W)
    wrow = _wrow_lm(local, frac, spec)
    wr = (rows.astype(jnp.float32) * wrow).astype(jnp.bfloat16)    # (L, N, W)
    h1 = jax.lax.dot_general(
        wr, w1big.astype(jnp.bfloat16),
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                              # (N, H)
    return h1, (slot, wr, rows)


def _encode_mlp_fwd(spec, need_x_grad, x, table, w1big):
    out, (slot, wr, rows) = _encode_mlp_fwd_impl(spec, x, table, w1big)
    return out, (x, slot, wr, w1big, rows if need_x_grad else None)


def _encode_mlp_bwd(spec, need_x_grad, res, g):
    x, slot, wr, w1big, rows = res
    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    g16 = g.astype(jnp.bfloat16)                                   # (N, H)

    # dL/dw1big: contract (L, N, W) x (N, H) over N -> (L, W, H)
    d_w1big = jax.lax.dot_general(
        wr, g16, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dL/dwr: (N, H) x (L, W, H) over H -> (N, L, W)
    d_wr = jax.lax.dot_general(
        g16, w1big.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)                        # (N, L, W)

    xc = jnp.clip(x, 0.0, 1.0)
    _, local, frac = _slots_local_frac_lm(xc, spec)
    wrow = _wrow_lm(local, frac, spec)                             # (L, N, W)

    # per-level scatter-adds (each target slice <= 4 MB — fast scatter path)
    parts = []
    for l in range(L):
        d_rows_l = d_wr[:, l, :] * wrow[l]                         # (N, W)
        parts.append(
            jnp.zeros((spec.sizes[l], W), jnp.float32)
            .at[slot[l] - spec.offsets[l]].add(d_rows_l))
    d_table = jnp.concatenate(parts, axis=0)

    if need_x_grad:
        cx, cy, cz, lane_valid, _ = _lane_consts(spec)
        rg = (rows.astype(jnp.float32)
              * jnp.moveaxis(d_wr, 0, 1) * lane_valid[None, None, :])
        wx = _axis_w(cx, local[..., 0], frac[..., 0])
        wy = _axis_w(cy, local[..., 1], frac[..., 1])
        wz = _axis_w(cz, local[..., 2], frac[..., 2])
        dwx = _axis_dw(cx, local[..., 0])
        dwy = _axis_dw(cy, local[..., 1])
        dwz = _axis_dw(cz, local[..., 2])
        d_frac = jnp.stack([
            jnp.sum(rg * dwx * wy * wz, axis=-1),
            jnp.sum(rg * wx * dwy * wz, axis=-1),
            jnp.sum(rg * wx * wy * dwz, axis=-1),
        ], axis=-1)                                                # (L, N, 3)
        res_f = jnp.asarray(spec.resolutions, jnp.float32)
        in_box = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)
        d_x = jnp.sum(d_frac * res_f[:, None, None], axis=0) * in_box
    else:
        d_x = jnp.zeros_like(x)
    return d_x, d_table, d_w1big


_encode_mlp_cv.defvjp(_encode_mlp_fwd, _encode_mlp_bwd)


# ---------------------------------------------------------------------------
# Pallas-fused variant (TPU): the gather stays in XLA, but the trilinear
# lane-weight product and the first-layer contraction run in one VMEM-resident
# kernel (ops/hash_encoding_pallas.py) instead of materializing (L, N, 64)
# HBM intermediates.  Used when position gradients are not needed (the
# x-grad path keeps the XLA implementation above).
# ---------------------------------------------------------------------------


def _meta_p(local, frac):
    """(L, N, 3) local/frac -> (L, N, 4) p = local + frac, lane-padded."""
    p = local.astype(jnp.float32) + frac
    return jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)


def _meta_T(local, frac, dup: int):
    """(L, N, 3) local/frac -> (L, dup*4, N/dup) transposed p-values.

    meta_T[l, d*4+a, m] = p[l, m*dup + d, a].  N on the lane axis keeps the
    kernel input un-padded (a (L, N, 4) minor-dim-4 buffer would be
    lane-padded 4 -> 128, a 32x read amplification)."""
    p4 = _meta_p(local, frac)                                   # (L, N, 4)
    L, N = p4.shape[0], p4.shape[1]
    return p4.reshape(L, N // dup, dup * 4).transpose(0, 2, 1)


def _pick_bn(n: int) -> int:
    for bn in (4096, 2048, 1024, 512, 256, 128):
        if n % bn == 0:
            return bn
    return 0


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _encode_mlp_pl_cv(spec: HashGridSpec, bn: int, x, table, w1):
    out, _ = _encode_mlp_pl_fwd(spec, bn, x, table, w1)
    return out


def _encode_mlp_pl_fwd(spec, bn, x, table, w1):
    from ngp_pl_tpu.ops.hash_encoding_pallas import (
        encode_mlp_fwd_pallas,
        pack_table_f16,
    )

    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    dup = 2 if W == 64 else 1
    xc = jnp.clip(x, 0.0, 1.0)
    slot, local, frac = _slots_local_frac_lm(xc, spec)
    meta_T = _meta_T(local, frac, dup)
    if W == 128:
        # swizzled-f16 rows: halves the dominant random-read bandwidth at
        # tinycudann's table precision; decoded inside the kernel
        rows = pack_table_f16(table)[slot.reshape(-1)].reshape(L, N, W // 2)
    else:
        rows = _gather_rows_bf16(table, slot.reshape(-1)).reshape(L, N, W)
    h1, ft2 = encode_mlp_fwd_pallas(rows, meta_T, expand_w1(w1, spec),
                                    F=spec.n_features, bn=bn)
    return h1, (slot, meta_T, ft2, w1)


def _encode_mlp_pl_bwd(spec, bn, res, g):
    from ngp_pl_tpu.ops.hash_encoding_pallas import encode_mlp_bwd_pallas

    slot, meta_T, ft2, w1 = res
    L, F, W = spec.n_levels, spec.n_features, spec.row_width
    dup = 2 if W == 64 else 1
    H = g.shape[-1]
    M = meta_T.shape[-1]
    N = M * dup

    # h1 = feats_flat @ w1, so dL/dw1 = feats^T g, from the PACKED residual:
    # ft2 (L, dup*F, M) x g_k (M, dup*H) over M -> (L, dup*F, dup*H), then
    # sum the sample-parity-diagonal blocks.  Both operands have M on the
    # lane axis — no relayout.
    g_k = g.reshape(M, dup * H)
    out2 = jax.lax.dot_general(
        ft2.astype(jnp.bfloat16), g_k.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = out2.reshape(L, dup, F, dup, H)
    d_w1 = sum(o[:, d, :, d, :] for d in range(dup)).reshape(L * F, H)

    d_rows = encode_mlp_bwd_pallas(meta_T, expand_w1(w1, spec), g,
                                   F=spec.n_features, bn=bn)

    # per-level scatter-adds (each target slice stays small — fast path);
    # d_rows arrive bf16 and accumulate into the f32 table gradient.
    # NGP_SCATTER=pallas swaps in the Pallas reductions (scatter_accum /
    # one-hot MXU for dense levels) for on-chip A/B — see
    # benchmarking/micro_scatter2.py and PERF.md r5.
    import os as _os

    # Measured r5 (micro_scatter2, real fence): the MXU one-hot reduction
    # beats XLA scatter-add 1.3-2x on the DENSE coarse levels (R <= 4096);
    # the sequential-VMEM scatter_accum LOSES everywhere (the per-sample
    # dynamic RMW loop runs ~2x slower than XLA's scatter) and stays
    # available for benchmarking only.  NGP_SCATTER=xla forces the old
    # path for A/B.
    use_onehot = (W == 128 and jax.default_backend() != "cpu"
                  and _os.environ.get("NGP_SCATTER") != "xla")
    parts = []
    for l in range(L):
        idx_l = slot[l] - spec.offsets[l]
        R = spec.sizes[l]
        if use_onehot and R <= 4096:
            from ngp_pl_tpu.ops.scatter_accum import scatter_onehot

            Rp = -(-R // 8) * 8
            # bf16 one-hot is lossless here: d_rows are ALREADY bf16
            parts.append(scatter_onehot(
                d_rows[l].astype(jnp.float32), idx_l,
                n_rows=Rp, exact=False)[:R])
        else:
            parts.append(
                jnp.zeros((R, W), jnp.float32)
                .at[idx_l].add(d_rows[l].astype(jnp.float32)))
    d_table = jnp.concatenate(parts, axis=0)
    d_x = jnp.zeros((N, 3), jnp.float32)
    return d_x, d_table, d_w1


_encode_mlp_pl_cv.defvjp(_encode_mlp_pl_fwd, _encode_mlp_pl_bwd)


def _pallas_available() -> bool:
    return jax.default_backend() != "cpu"


@partial(jax.jit, static_argnames=("spec", "need_x_grad"))
def hash_encode_mlp(
    x: jnp.ndarray,
    table: jnp.ndarray,
    w1: jnp.ndarray,
    spec: HashGridSpec,
    need_x_grad: bool = True,
) -> jnp.ndarray:
    """Fused hash encoding + first dense layer.

    Computes `hash_encode(x, table, spec) @ w1` as one level-major
    gather->multiply->MXU contraction (see module comment above).

    Args:
      x: (N, 3) in [0, 1]^3.  table: (total_rows, W).  w1: (L*F, H).
    Returns: (N, H) pre-activation, fp32.
    """
    bn = _pick_bn(x.shape[0])
    if not need_x_grad and bn and _pallas_available():
        return _encode_mlp_pl_cv(spec, bn, x, table, w1)
    return _encode_mlp_cv(spec, bool(need_x_grad), x, table, expand_w1(w1, spec))


@partial(jax.jit, static_argnames=("spec", "need_x_grad"))
def hash_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    spec: HashGridSpec,
    need_x_grad: bool = True,
) -> jnp.ndarray:
    """Encode positions.

    Args:
      x: (N, 3) positions in [0, 1]^3 (caller normalizes by the scene box,
         reference models/networks.py:103).
      table: (total_rows, 64) parameter table.
      spec: static grid geometry.
      need_x_grad: False skips the position-gradient path in the backward
        (one merged row re-gather + the trilinear-derivative math) — only
        camera-pose refinement needs dL/dx (reference train.py:117-122).

    Returns:
      (N, L*F) features, fp32.
    """
    return _hash_encode_cv(spec, bool(need_x_grad), x, table)


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
