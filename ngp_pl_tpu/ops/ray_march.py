"""Occupancy-guided ray marching, TPU-native.

Replaces the reference `raymarching_train` / `raymarching_test` CUDA kernels
(reference models/csrc/raymarching.cu:166-454).  The CUDA design is a
sequential per-ray while-loop with DDA empty-space skipping and atomicAdd
compaction into a CSR sample buffer.  The key observation enabling a
fully-parallel TPU redesign: the reference's skip branch still advances `t`
along the *same* dt-chain (`do { t += calc_dt(t); } while (t < t_target)`,
raymarching.cu:229-233), so the k-th marching position is a closed-form
function of (t_start, k) independent of scene content:

    dt(t) = clamp(t * f, dt_min, dt_max)            (raymarching.cu:11-13)

    f == 0:  t_k = t0 + k * dt_min                        (pure linear)
    f  > 0:  linear phase   (t < dt_min/f):  dt = dt_min
             geometric phase (t < dt_max/f): t *= (1 + f)
             linear phase   (t >= dt_max/f): dt = dt_max

The whole march therefore becomes: evaluate the closed-form t-chain for all
(ray, k) pairs at once, gather occupancy for every candidate, and compact the
occupied samples into a flat fixed-size pool with a deterministic prefix-sum
scatter (replacing the atomic counter, raymarching.cu:237-241).  No sequential
loops, no atomics, no dynamic shapes — and bit-for-bit deterministic.

Occupancy is stored as a plain row-major uint8 grid (C, G, G, G) — one byte
per cell instead of the reference's Morton-ordered bitfield — because a byte
gather is what the hardware does anyway and it keeps index math off the hot
path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


class MarchResults(NamedTuple):
    """Flat sample pool, ordered by (ray, t) — the CSR layout of the reference
    (`rays_a`, custom_functions.py:125-128) with deterministic offsets."""

    ts: jnp.ndarray        # (P,) sample distance along ray
    deltas: jnp.ndarray    # (P,) integration interval
    ray_idx: jnp.ndarray   # (P,) int32 owning ray; == N_rays for unused slots
    valid: jnp.ndarray     # (P,) bool slot validity
    counts: jnp.ndarray    # (N_rays,) samples per ray actually in the pool
    offsets: jnp.ndarray   # (N_rays,) start slot per ray (exclusive cumsum)
    total: jnp.ndarray     # () int32 total samples in the pool
    rm_counts: jnp.ndarray  # (N_rays,) samples found by marching (pre-clip)
    chain_demand: jnp.ndarray  # () int32 chain steps the batch actually needs
    chain_demand_q: jnp.ndarray  # () int32 99th-pct per-ray chain-step need


def calc_dt(t, exp_step_factor, max_samples, grid_size, scale):
    """Step size along the chain (raymarching.cu:11-13)."""
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size
    return jnp.clip(t * exp_step_factor, dt_min, dt_max)


def _chain_t(t0, k, exp_step_factor, dt_min, dt_max):
    """Closed-form t_k for the dt-chain starting at t0.

    t0: (N, 1) start distances; k: (1, K) step indices. Returns (N, K).
    """
    if exp_step_factor == 0.0:
        return t0 + k * dt_min
    f = exp_step_factor
    log1pf = math.log1p(f)
    t_a = dt_min / f   # below: dt = dt_min
    t_b = dt_max / f   # above: dt = dt_max
    # phase 1: n1 linear steps of dt_min until t >= t_a
    n1 = jnp.ceil(jnp.maximum(t_a - t0, 0.0) / dt_min)
    t1 = t0 + n1 * dt_min
    # phase 2: n2 geometric steps (t *= 1+f) until t >= t_b
    n2 = jnp.ceil(
        jnp.maximum(jnp.log(jnp.maximum(t_b, 1e-30) / jnp.maximum(t1, 1e-30)), 0.0)
        / log1pf
    )
    t2 = t1 * jnp.exp(n2 * log1pf)
    # piecewise evaluation
    in1 = k < n1
    in2 = k < n1 + n2
    t_lin1 = t0 + k * dt_min
    t_geo = t1 * jnp.exp((k - n1) * log1pf)
    t_lin2 = t2 + (k - n1 - n2) * dt_max
    return jnp.where(in1, t_lin1, jnp.where(in2, t_geo, t_lin2))


def mip_from_pos(xyz, cascades):
    """Cascade from position magnitude (raymarching.cu:19-23).

    |xyz| in [0, .5) -> 0, [.5, 1) -> 1, [1, 2) -> 2, ...
    """
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    e = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-10))).astype(jnp.int32) + 2
    return jnp.clip(e, 0, cascades - 1)


def mip_from_dt(dt, grid_size, cascades):
    """Cascade from step size (raymarching.cu:28-32)."""
    e = jnp.floor(jnp.log2(jnp.maximum(dt * grid_size, 1e-10))).astype(jnp.int32) + 1
    return jnp.clip(e, 0, cascades - 1)


def _grid_coords(xyz, dt, cascades, scale, grid_size):
    """(mip, nx, ny, nz) int32 cell coords for each sample position."""
    if cascades == 1:
        # single-cascade scenes (scale <= 0.5): mip is identically 0 and the
        # bound is `scale` — skip the per-sample log2/exp2 pipeline entirely
        mip = jnp.zeros(xyz.shape[:-1], jnp.int32)
        mip_bound = scale
        u = (xyz / mip_bound + 1.0) * 0.5 * grid_size
        n = jnp.clip(u, 0.0, grid_size - 1.0).astype(jnp.int32)
        return mip, n
    mip = jnp.maximum(
        mip_from_pos(xyz, cascades), mip_from_dt(dt, grid_size, cascades)
    )
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), scale)
    u = (xyz / mip_bound[..., None] + 1.0) * 0.5 * grid_size
    n = jnp.clip(u, 0.0, grid_size - 1.0).astype(jnp.int32)
    return mip, n


def occupancy_at(occ_grid, xyz, dt, cascades, scale, grid_size):
    """Narrow per-cell lookup (reference-style; used by tests and small
    paths).  occ_grid: (C, G, G, G) uint8. Returns (...) bool."""
    mip, n = _grid_coords(xyz, dt, cascades, scale, grid_size)
    flat = (
        mip * (grid_size ** 3)
        + (n[..., 0] * grid_size + n[..., 1]) * grid_size
        + n[..., 2]
    )
    return occ_grid.reshape(-1)[flat.reshape(-1)].reshape(flat.shape) > 0


def occupancy_lines(occ_grid):
    """(C, G, G, G) uint8 -> (C*G*G, G//32) int32 bit-packed z-line rows.

    TPU random access is fast only at row granularity, so the marcher fetches
    the whole z-line containing each queried cell (one ~2.2ns row-gather
    instead of a 5ns byte-gather) and extracts the bit with lane math.
    1 bit/cell keeps the row fetch at 16 bytes for G=128."""
    C, G = occ_grid.shape[0], occ_grid.shape[1]
    W = max(1, (G + 31) // 32)
    flat = occ_grid.reshape(C * G * G, G)
    if W * 32 != G:
        flat = jnp.pad(flat, ((0, 0), (0, W * 32 - G)))
    bits = (flat.reshape(C * G * G, W, 32) > 0).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return (bits * weights[None, None, :]).sum(axis=-1).astype(jnp.uint32)


def occupancy_at_lines(occ_rows, mip, n, grid_size):
    """Wide-row occupancy test. occ_rows from occupancy_lines;
    mip (...,), n (..., 3) int32. Returns (...) bool."""
    G = grid_size
    W = max(1, (G + 31) // 32)
    line = (mip * G + n[..., 0]) * G + n[..., 1]
    rows = occ_rows[line.reshape(-1)]                 # (M, W) uint32
    nz = n[..., 2].reshape(-1)
    word_idx = nz >> 5
    lane = jnp.arange(W, dtype=jnp.int32)
    word = jnp.sum(
        jnp.where(lane[None, :] == word_idx[:, None], rows,
                  jnp.uint32(0)), axis=1)
    bit = (word >> (nz & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return (bit > 0).reshape(mip.shape)


@partial(
    jax.jit,
    static_argnames=(
        "cascades", "scale", "exp_step_factor", "grid_size", "max_samples",
        "n_samples", "chain_length",
    ),
)
def march_rays_test_round(
    rays_o: jnp.ndarray,      # (N, 3) — compacted alive rays
    rays_d: jnp.ndarray,      # (N, 3)
    t_start: jnp.ndarray,     # (N,) resume cursor (reference hits_t[r][0])
    t_end: jnp.ndarray,       # (N,) far bound
    occ_grid: jnp.ndarray,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    n_samples: int,           # occupied samples to produce per ray this round
    chain_length: int,        # chain steps to examine per ray this round
    occ_rows: jnp.ndarray | None = None,  # precomputed occupancy_lines
    win_rows: jnp.ndarray | None = None,  # packed 8^3 windows (uniform step)
):
    """One inference marching round (reference raymarching.cu:335-454).

    Returns (ts (N, S), deltas (N, S), valid (N, S) bool, t_next (N,),
    n_eff (N,)). `t_next` is the resume cursor: the chain position after the
    last examined step, or just past the n_samples-th occupied sample.

    With `win_rows` (single cascade, uniform stepping) the occupancy test
    runs via one 64-byte window gather per 8 chain steps instead of one
    z-line gather per step — same bits, ~8x fewer random accesses.
    """
    N = rays_o.shape[0]
    K, S = chain_length, n_samples
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size

    use_window = (win_rows is not None and exp_step_factor == 0.0
                  and cascades == 1 and K % SEGMENT_J == 0)
    use_window_mc = (win_rows is not None and not use_window
                     and (cascades > 1 or exp_step_factor > 0.0)
                     and K % J_MC == 0)
    k = jnp.arange(K + 1, dtype=jnp.float32)[None, :]          # (1, K+1)
    ts_all = _chain_t(t_start[:, None], k, exp_step_factor, dt_min, dt_max)
    ts = ts_all[:, :K]                                         # (N, K)
    dts = jnp.clip(ts * exp_step_factor, dt_min, dt_max)
    in_range = (ts < t_end[:, None]) & (t_start[:, None] >= 0)

    if use_window:
        occ, _ = _occ_window_chain(
            rays_o, rays_d, t_start, K // SEGMENT_J, win_rows,
            scale=scale, grid_size=grid_size, dt_min=dt_min)
        occ = occ.reshape(N, K)
    elif use_window_mc:
        occ, _, _ = _occ_window_chain_mc(
            rays_o, rays_d, t_start, K // J_MC, win_rows, cascades=cascades,
            scale=scale, grid_size=grid_size,
            exp_step_factor=exp_step_factor, dt_min=dt_min, dt_max=dt_max)
    else:
        xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
        mip, n = _grid_coords(xyz, dts, cascades, scale, grid_size)
        if occ_rows is None:
            occ_rows = occupancy_lines(occ_grid)
        occ = occupancy_at_lines(occ_rows, mip, n, grid_size)
    occ = occ & in_range                                       # (N, K)

    # first-S selection via the bit-packed popcount scheme (shared with the
    # strided train march) — replaces a full-width (N, K) cumsum + top_k
    # (top_k alone measured 2.74 ms at (8192, 896); per inference round at
    # (65536, 256) it dominated the round's cost)
    pad_k = (-K) % 32
    occ_p = (jnp.pad(occ, ((0, 0), (0, pad_k))) if pad_k else occ)
    k_idx, counts, _total = _select_first_bits(occ_p, S)
    n_eff = counts                                             # (N,)
    s_valid = jnp.arange(S, dtype=jnp.int32)[None, :] < n_eff[:, None]
    # recompute t at the selected chain indices from the closed form — a
    # take_along_axis here would lower to a per-row gather (measured ~5x the
    # cost of the arithmetic at pool shapes)
    ts_s = _chain_t(t_start[:, None], k_idx.astype(jnp.float32),
                    exp_step_factor, dt_min, dt_max)
    dts_s = jnp.clip(ts_s * exp_step_factor, dt_min, dt_max)

    # resume cursor: after the S-th occupied sample, else after the last
    # examined chain step (still < t_end) — mirrors hits_t advance in the
    # reference test kernel (raymarching.cu:390)
    last_k = jnp.max(jnp.where(s_valid, k_idx, -1), axis=1)    # (N,)
    last_t = jnp.where(
        n_eff >= S,
        _chain_t(t_start, (last_k + 1).astype(jnp.float32),
                 exp_step_factor, dt_min, dt_max),
        ts_all[:, K],
    )
    t_next = jnp.minimum(last_t, t_end)
    return ts_s, dts_s, s_valid, t_next, n_eff


def occupied_span_prep(occ_grid, *, grid_size, super_factor: int = 4):
    """Packed dilated super-grid lines for `occupied_span` — split out so
    eval renderers can compute it ONCE per grid instead of per chunk (the
    reduce_window + packing over the 128^3 grid costs ~20 ms on-chip)."""
    SG = grid_size // super_factor
    sup = (occ_grid[0].reshape(SG, super_factor, SG, super_factor,
                               SG, super_factor) > 0).any(axis=(1, 3, 5))
    sup_d = jax.lax.reduce_window(
        sup.astype(jnp.uint32), jnp.uint32(0), jax.lax.max,
        (3, 3, 3), (1, 1, 1), "SAME")                     # (SG, SG, SG)
    # pack z into words (SG <= 32 -> one uint32 per (x, y) line)
    W = max(1, (SG + 31) // 32)
    bits = sup_d.reshape(SG * SG, W, 32 if SG >= 32 else SG)
    weights = (jnp.uint32(1) << jnp.arange(bits.shape[-1], dtype=jnp.uint32))
    return (bits * weights[None, None, :]).sum(axis=-1)   # (SG*SG, W) uint32


def occupied_span(rays_o, rays_d, t1, t2, occ_grid, *, scale, grid_size,
                  dt_min, super_factor: int = 4, span_lines=None):
    """Conservative per-ray bounds [t_s, t_e] of the occupied region
    (single-cascade scenes).

    A coarse pre-march over a dilated super-grid (super_factor^3 cells per
    supercell, 3^3 max-pool dilation) samples at half-supercell spacing;
    dilation guarantees point sampling cannot miss an occupied cell, so every
    occupied fine-chain sample lies in [t_s, t_e].  t_s is snapped DOWN to the
    dt_min lattice anchored at t1, so fine-chain sample positions are
    bit-identical to the unskipped chain's (the skip removes provably-empty
    prefix/suffix work, never changes sample placement).  TPU rationale: the
    fine march's cost is ~linear in chain steps; the coarse pass costs
    N x ~114 gathers from a 4 KB table.

    span_lines: optional prebuilt occupied_span_prep output (per-grid
    cacheable); occ_grid may be None when given.

    Returns (t_s, t_e, span_steps) with span_steps = per-ray needed fine
    chain steps (0 when nothing occupied).
    """
    SG = grid_size // super_factor
    if span_lines is None:
        span_lines = occupied_span_prep(occ_grid, grid_size=grid_size,
                                        super_factor=super_factor)
    lines = span_lines
    W = lines.shape[-1]

    e = 2.0 * scale / SG
    dt_c = 0.5 * e
    K_c = int(math.ceil(2.0 * scale * SQRT3 / dt_c)) + 2

    k = jnp.arange(K_c, dtype=jnp.float32)[None, :]
    ts_c = t1[:, None] + (k + 0.5) * dt_c                 # (N, K_c) midpoints
    # an interval [t1+k*dt_c, t1+(k+1)*dt_c) matters if it STARTS before t2;
    # its midpoint may stick out past t2 — the box clip below projects it
    # back (non-expansive), keeping the 1-cell dilation guarantee intact
    in_r = (t1[:, None] >= 0) & (ts_c - 0.5 * dt_c < t2[:, None])
    xyz = rays_o[:, None, :] + ts_c[..., None] * rays_d[:, None, :]
    u = (xyz / scale + 1.0) * 0.5 * SG
    n = jnp.clip(u, 0.0, SG - 1.0).astype(jnp.int32)
    line_idx = n[..., 0] * SG + n[..., 1]
    rows = lines[line_idx.reshape(-1)]                    # (M, W)
    nz = n[..., 2].reshape(-1)
    if W == 1:
        word = rows[:, 0]
    else:
        lane = jnp.arange(W, dtype=jnp.int32)
        word = jnp.sum(jnp.where(lane[None, :] == (nz >> 5)[:, None], rows,
                                 jnp.uint32(0)), axis=1)
    occ_c = ((word >> (nz & 31).astype(jnp.uint32)) & 1) > 0
    occ_c = occ_c.reshape(ts_c.shape) & in_r              # (N, K_c)

    any_hit = occ_c.any(axis=1)
    first_k = jnp.argmax(occ_c, axis=1)
    last_k = K_c - 1 - jnp.argmax(occ_c[:, ::-1], axis=1)
    t_s = t1 + first_k.astype(jnp.float32) * dt_c
    t_e = jnp.minimum(t2, t1 + (last_k + 1).astype(jnp.float32) * dt_c)
    # snap the skip to the fine-chain lattice
    m = jnp.floor(jnp.maximum(t_s - t1, 0.0) / dt_min)
    t_s = t1 + m * dt_min
    t_s = jnp.where(any_hit, t_s, t2)
    t_e = jnp.where(any_hit, t_e, t2)
    span_steps = jnp.where(
        any_hit & (t1 >= 0),
        jnp.ceil((t_e - t_s) / dt_min).astype(jnp.int32) + 1,
        0,
    )
    return t_s, t_e, span_steps


def dilate_grid(occ_grid: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 max-pool dilation of the occupancy grid (per cascade).

    Used by the segment march: a point test against the dilated grid is a
    conservative emptiness test for everything within one cell of the point.
    """
    return jax.lax.reduce_window(
        occ_grid, jnp.uint8(0), jax.lax.max,
        (1, 3, 3, 3), (1, 1, 1, 1), "SAME")


def dilate_lines(occ_rows: jnp.ndarray, cascades: int, grid_size: int
                 ) -> jnp.ndarray:
    """3x3x3 binary dilation directly on the bit-packed z-line rows.

    Equivalent to `occupancy_lines(dilate_grid(grid))` but operates on the
    packed (C*G*G, W) uint32 representation (64 KB for C=1, G=128) with ~10
    elementwise OR/shift passes instead of a reduce_window over the 2M-cell
    uint8 grid — separable dilation: z by word shifts with cross-word carries,
    then y and x by row shifts."""
    G = grid_size
    W = occ_rows.shape[-1]
    a = occ_rows
    # z: bits within words + carries across word boundaries
    hi = jnp.concatenate(   # bit 31 of word w-1 -> bit 0 of word w
        [jnp.zeros_like(a[:, :1]), a[:, :-1] >> 31], axis=1)
    lo = jnp.concatenate(   # bit 0 of word w+1 -> bit 31 of word w
        [a[:, 1:] << 31, jnp.zeros_like(a[:, :1])], axis=1)
    a = a | (a << 1) | hi | (a >> 1) | lo
    # y: OR rows y-1, y, y+1
    a = a.reshape(cascades * G, G, W)
    a = a | jnp.concatenate([a[:, :1] & 0, a[:, :-1]], axis=1) \
          | jnp.concatenate([a[:, 1:], a[:, :1] & 0], axis=1)
    # x: OR rows x-1, x, x+1
    a = a.reshape(cascades, G, G, W)
    a = a | jnp.concatenate([a[:, :1] & 0, a[:, :-1]], axis=1) \
          | jnp.concatenate([a[:, 1:], a[:, :1] & 0], axis=1)
    return a.reshape(cascades * G * G, W)


# fine chain steps per coarse interval.  The interval midpoint's dilated-grid
# test covers +-(J-1)/2 * dt_min * |d_axis| of per-axis travel; with
# dt_min = sqrt(3)/1024 and 128^3 cells this stays under one cell for
# |d_axis| <= ~1.27, i.e. any camera with full horizontal FOV < ~103 deg
# (callers check via `segment_march_dmax_ok`).
SEGMENT_J = 8

# windowed-occupancy geometry (see occupancy_windows / march_rays_train_window)
WIN_B = 4       # window anchor stride in cells
WIN_P = 8       # window extent in cells per axis (8^3 = 512 bits = 16 words)
WIN_APRON = 2   # cells of apron on each side: window w covers [4w-2, 4w+6)
WIN_WORDS = WIN_P ** 3 // 32


def occupancy_windows_from_rows(occ_rows: jnp.ndarray, cascades: int,
                                grid_size: int) -> jnp.ndarray:
    """Packed-bit rebuild of the 8^3 windows from z-line rows.

    Equivalent to `occupancy_windows(occ_grid)` but computed from the
    bit-packed (C*G*G, W) uint32 z-lines with pure shift/mask math: the
    per-window 8-bit z-field is sliced out of each line's words (32 static
    shift patterns over 16K rows), then the overlapping x/y window expansion
    runs over (C, G, G, NW) uint32 z-fields — 32x less data than the bool
    take/transpose formulation this replaces (the grid refresh's dominant
    cost, ~58 ms -> bit math over ~2M words).
    """
    C, G = cascades, grid_size
    W = occ_rows.shape[-1]
    NW = G // WIN_B
    rows = occ_rows.reshape(C * G * G, W)
    # 8-bit z-field per window anchor: bits [4wz-2, 4wz+6) of the z-line
    zf_parts = []
    for wz in range(NW):
        z0 = WIN_B * wz - WIN_APRON
        if z0 < 0:
            f = (rows[:, 0] << jnp.uint32(-z0)) & jnp.uint32(0xFF)
        else:
            w_lo, s = z0 // 32, z0 % 32
            f = rows[:, w_lo] >> jnp.uint32(s)
            if s > 32 - WIN_P and w_lo + 1 < W:
                f = f | (rows[:, w_lo + 1] << jnp.uint32(32 - s))
            f = f & jnp.uint32(0xFF)
        zf_parts.append(f)
    zf = jnp.stack(zf_parts, axis=-1).reshape(C, G, G, NW)
    # overlapping 8-wide x/y windows (zero apron outside the grid)
    zfp = jnp.pad(zf, ((0, 0), (WIN_APRON, WIN_P - WIN_B - WIN_APRON),
                       (WIN_APRON, WIN_P - WIN_B - WIN_APRON), (0, 0)))
    idx = (WIN_B * jnp.arange(NW, dtype=jnp.int32)[:, None]
           + jnp.arange(WIN_P, dtype=jnp.int32)[None, :]).reshape(-1)
    a = jnp.take(zfp, idx, axis=1)
    a = jnp.take(a, idx, axis=2)                     # (C, NW*8, NW*8, NW)
    a = a.reshape(C, NW, WIN_P, NW, WIN_P, NW).transpose(0, 1, 3, 5, 2, 4)
    # word w = lx*2 + ly//4 holds lane (ly%4)*8 + lz: shift the 4 z-fields of
    # one ly quartet into one uint32
    a = a.reshape(C, NW, NW, NW, WIN_P, WIN_WORDS // WIN_P, 4)
    shifts = jnp.uint32(1) << (8 * jnp.arange(4, dtype=jnp.uint32))
    words = jnp.sum(a * shifts, axis=-1, dtype=jnp.uint32)
    return words.reshape(C * NW ** 3, WIN_WORDS)


def occupancy_windows(occ_grid: jnp.ndarray) -> jnp.ndarray:
    """(C, G, G, G) uint8 -> (C*(G/4)^3, 16) uint32 packed 8^3-cell windows.

    Window w = (wx, wy, wz) covers cells [4w - 2, 4w + 6) per axis — the 4^3
    anchor brick plus a 2-cell apron.  Bit (lx*8 + ly)*8 + lz of the row is
    cell 4w - 2 + (lx, ly, lz).  One 64-byte row gather therefore answers
    occupancy for EVERY sample whose cell lies within one cell of any cell of
    the anchor brick — the windowed marcher fetches one row per 8-step chain
    interval instead of one z-line row per step (8x fewer gathers; gather
    cost is per ROW on TPU, not per byte).  Overlap factor 8 in storage:
    2 MB per cascade at G=128 — rebuilt with the grid every 16 steps via
    packed bit math (occupancy_windows_from_rows).
    """
    C, G = occ_grid.shape[0], occ_grid.shape[1]
    return occupancy_windows_from_rows(occupancy_lines(occ_grid), C, G)


def _occ_window_chain(rays_o, rays_d, t0, KA, win_rows, *, scale, grid_size,
                      dt_min):
    """Occupancy bits for KA*J uniform chain steps starting at t0, one 64B
    window gather per J=8-step interval.

    Returns (occ (N, KA, J) bool, ts (N, KA, J) f32).  Valid under the
    `segment_march_dmax_ok` direction bound (steps stay within one cell of
    their interval midpoint)."""
    N = rays_o.shape[0]
    J = SEGMENT_J
    G = grid_size
    NW = G // WIN_B

    c = jnp.arange(KA, dtype=jnp.float32)[None, :]
    m_t = t0[:, None] + (c * J + 0.5 * (J - 1)) * dt_min        # (N, KA)
    xyz_m = rays_o[:, None, :] + m_t[..., None] * rays_d[:, None, :]
    u_m = (xyz_m / scale + 1.0) * 0.5 * G
    n_m = jnp.clip(u_m, 0.0, G - 1.0).astype(jnp.int32)         # (N, KA, 3)
    w = n_m >> 2                                                # anchor brick
    widx = (w[..., 0] * NW + w[..., 1]) * NW + w[..., 2]
    rows = win_rows[widx.reshape(-1)].reshape(N, KA, WIN_WORDS)

    kk = (jnp.arange(KA, dtype=jnp.int32)[None, :, None] * J
          + jnp.arange(J, dtype=jnp.int32)[None, None, :])      # (1, KA, J)
    ts = t0[:, None, None] + kk.astype(jnp.float32) * dt_min    # (N, KA, J)
    xyz = rays_o[:, None, None, :] + ts[..., None] * rays_d[:, None, None, :]
    uf = (xyz / scale + 1.0) * 0.5 * G
    n = jnp.clip(uf, 0.0, G - 1.0).astype(jnp.int32)            # (N, KA, J, 3)
    local = jnp.clip(n - ((w[:, :, None, :] << 2) - WIN_APRON), 0, WIN_P - 1)
    bit = (local[..., 0] * WIN_P + local[..., 1]) * WIN_P + local[..., 2]
    word_idx = bit >> 5                                          # (N, KA, J)
    word = jnp.zeros(bit.shape, jnp.uint32)
    for wi in range(WIN_WORDS):
        word = word | jnp.where(word_idx == wi, rows[:, :, wi:wi + 1],
                                jnp.uint32(0))
    occ = ((word >> (bit & 31).astype(jnp.uint32)) & jnp.uint32(1)) > 0
    return occ, ts


@partial(
    jax.jit,
    static_argnames=("scale", "grid_size", "max_samples", "pool_size",
                     "chain_length"),
)
def march_rays_train_window(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    hits_t: jnp.ndarray,
    noise: jnp.ndarray,
    win_rows: jnp.ndarray,        # from occupancy_windows
    *,
    scale: float,
    grid_size: int,
    max_samples: int,
    pool_size: int,
    chain_length: int,
) -> MarchResults:
    """Windowed occupancy march (single cascade, uniform stepping).

    Produces the SAME sample set as `march_rays_train` (bit-identical t
    values) with ~J=8x fewer random-memory accesses: the dt-chain is cut
    into intervals of 8 fine steps; the 8 steps of one interval span
    < (J-1) * dt_min < 2 cells, so ONE 64-byte window row (gathered at the
    interval midpoint's anchor brick) contains every step's occupancy bit —
    extracted with pure lane math, no further memory traffic.  This
    supersedes the two-level dilated-interval scheme (march_rays_train_
    segments): no dilation false-positives, no top_k interval selection, and
    exact per-step bits for the whole chain.  Validity requires the same
    direction bound as the segment march (`segment_march_dmax_ok`): per-axis
    travel over half an interval must stay under one cell.

    Replaces the reference's DDA skip loop (raymarching.cu:225-233) on TPU.
    """
    N = rays_o.shape[0]
    J = SEGMENT_J
    K = -(-chain_length // J) * J
    KA = K // J
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size

    t1 = hits_t[:, 0]
    t2 = hits_t[:, 1]
    hit = t1 >= 0
    t0 = t1 + dt_min * noise                     # calc_dt == dt_min here

    occ, ts = _occ_window_chain(
        rays_o, rays_d, t0, KA, win_rows,
        scale=scale, grid_size=grid_size, dt_min=dt_min)
    ts = ts.reshape(N, K)
    in_range = hit[:, None] & (ts >= 0) & (ts < t2[:, None])
    occ = occ.reshape(N, K) & in_range                           # (N, K)

    kk1 = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]
    per_ray_need = jnp.max(jnp.where(occ, kk1, 0), axis=1)       # (N,)
    chain_demand = jnp.max(per_ray_need).astype(jnp.int32)
    chain_demand_q = _q99(per_ray_need)

    kk_all = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
    (pool_ts, pool_dts, pool_ray, pool_valid, in_pool_counts, offsets, total,
     rm_counts) = _compact_to_pool(
        occ, kk_all, t0, N, K, max_samples, pool_size, 0.0, dt_min, dt_max)

    return MarchResults(
        ts=pool_ts,
        deltas=pool_dts,
        ray_idx=pool_ray,
        valid=pool_valid,
        counts=in_pool_counts,
        offsets=offsets,
        total=total,
        rm_counts=rm_counts,
        chain_demand=chain_demand,
        chain_demand_q=chain_demand_q,
    )


J_MC = 4


def _occ_window_chain_mc(rays_o, rays_d, t0, KA, win_rows, *, cascades,
                         scale, grid_size, exp_step_factor, dt_min, dt_max):
    """Occupancy bits for KA*J_MC chain steps under multi-cascade /
    exponential stepping — TWO 64-byte window gathers per 4-step interval
    instead of one z-line gather per step (2x fewer random accesses).

    The single-cascade windowed march exploits dt_min << cell (8 steps per
    window).  With exp stepping the reference's step size is COMPARABLE to
    the cell of the dt-selected mip (raymarching.cu:28-32 picks the mip
    where dt in [cell/2, cell)), so only ~4 steps fit one 8^3 window — and
    the tested mip varies along the interval.  Design:

      - per-step mip = max(mip_from_pos, mip_from_dt), closed-form (no
        memory traffic; positions and dt come from the dt-chain closed form)
      - per interval, gather one window at the interval's MIN mip and one
        at its MAX mip, each anchored at the interval midpoint's 4^3 brick
        in that mip's cell coordinates (win_rows is per-cascade)
      - each step reads its bit from the window matching its own mip;
        a step whose mip is strictly between min and max (possible only
        when an interval straddles two mip boundaries at once — needs
        |x| or t to double within 4 steps) is treated as OCCUPIED
      - a step whose cell falls outside the gathered window (margin
        violation: dt-bound steps near dt == cell with long directions)
        is also treated as OCCUPIED

    "Occupied" fallbacks are conservative: the sample is evaluated by the
    field instead of skipped, costing one low-density sample — geometry is
    never missed, unlike a silently-wrong bit.  Typical scenes (f=1/256,
    G=128) have mip_from_pos ~2 mips above mip_from_dt, i.e. dt ~ cell/4,
    so margins hold and the bits are exact (golden-tested superset in
    tests/test_ray_march.py).

    Reference: the per-step DDA mip logic of raymarching.cu:204-233.
    """
    N = rays_o.shape[0]
    J = J_MC
    G = grid_size
    NW = G // WIN_B
    f = exp_step_factor

    kk = (jnp.arange(KA, dtype=jnp.float32)[:, None] * J
          + jnp.arange(J, dtype=jnp.float32)[None, :])           # (KA, J)
    ts = _chain_t(t0[:, None], kk.reshape(1, KA * J), f, dt_min,
                  dt_max).reshape(N, KA, J)
    dts = jnp.clip(ts * f, dt_min, dt_max)
    xyz = rays_o[:, None, None, :] + ts[..., None] * rays_d[:, None, None, :]
    mip = jnp.maximum(mip_from_pos(xyz, cascades),
                      mip_from_dt(dts, G, cascades))             # (N, KA, J)
    mip_lo = mip.min(axis=2)                                     # (N, KA)
    mip_hi = mip.max(axis=2)
    k_mid = (jnp.arange(KA, dtype=jnp.float32) * J
             + 0.5 * (J - 1))[None, :]
    t_mid = _chain_t(t0[:, None], k_mid, f, dt_min, dt_max)      # (N, KA)
    xyz_mid = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]

    def bits_at(m_sel):
        bound = jnp.minimum(
            jnp.exp2(m_sel.astype(jnp.float32) - 1.0), scale)    # (N, KA)
        u_mid = (xyz_mid / bound[..., None] + 1.0) * 0.5 * G
        n_mid = jnp.clip(u_mid, 0.0, G - 1.0).astype(jnp.int32)
        w = n_mid >> 2                                           # (N, KA, 3)
        widx = ((m_sel * NW + w[..., 0]) * NW + w[..., 1]) * NW + w[..., 2]
        rows = win_rows[widx.reshape(-1)].reshape(N, KA, WIN_WORDS)
        u = (xyz / bound[..., None, None] + 1.0) * 0.5 * G
        n = jnp.clip(u, 0.0, G - 1.0).astype(jnp.int32)          # (N,KA,J,3)
        local = n - ((w[:, :, None, :] << 2) - WIN_APRON)
        inwin = jnp.all((local >= 0) & (local < WIN_P), axis=-1)
        localc = jnp.clip(local, 0, WIN_P - 1)
        bit = (localc[..., 0] * WIN_P + localc[..., 1]) * WIN_P \
            + localc[..., 2]
        word_idx = bit >> 5                                      # (N, KA, J)
        word = jnp.zeros(bit.shape, jnp.uint32)
        for wi in range(WIN_WORDS):
            word = word | jnp.where(word_idx == wi, rows[:, :, wi:wi + 1],
                                    jnp.uint32(0))
        got = ((word >> (bit & 31).astype(jnp.uint32))
               & jnp.uint32(1)) > 0
        return jnp.where(inwin, got, True)       # out-of-window: occupied

    occ_hi = bits_at(mip_hi)
    occ_lo = bits_at(mip_lo)
    occ = jnp.where(mip == mip_lo[..., None], occ_lo,
                    jnp.where(mip == mip_hi[..., None], occ_hi, True))
    return (occ.reshape(N, KA * J), ts.reshape(N, KA * J),
            dts.reshape(N, KA * J))


def window_march_mc_ok(directions, exp_step_factor: float,
                       cascades: int) -> bool:
    """Eligibility of the multi-cascade windowed march.

    Margin violations degrade to conservative extra samples (never wrong
    bits), so the gate only excludes regimes where fallbacks would be
    pervasive: very aggressive exp factors (interval dt growth) or extreme
    direction norms."""
    import numpy as _np

    if cascades <= 1 and exp_step_factor == 0.0:
        return False                  # the uniform 8-step window path applies
    if exp_step_factor > 1.0 / 64.0:
        return False
    d = _np.asarray(directions)
    dmax = float(_np.sqrt((d * d).sum(axis=-1)).max())
    return dmax <= 2.0


def segment_march_dmax_ok(directions, grid_size: int = 128,
                          max_samples: int = 1024,
                          scale: float = 0.5) -> bool:
    """True if ray directions are short enough for the windowed/dilated
    interval test to be conservative (see SEGMENT_J).

    The march rotates camera-space directions into the world frame, so the
    bound uses the L2 norm (rotation-invariant: per-axis world travel is at
    most ||d||2 * dt).  The cell size is the WORLD cell 2*scale/grid_size —
    using the box-relative 1/grid_size would silently admit small-scale
    scenes whose fine steps leave the gathered window (wrong occupancy bits,
    no error)."""
    import numpy as _np

    d = _np.asarray(directions)
    dmax = float(_np.sqrt((d * d).sum(axis=-1)).max())
    cell = 2.0 * scale / grid_size               # world-units cell size
    dt_min = SQRT3 / max_samples
    return (SEGMENT_J - 1) / 2 * dt_min * dmax < cell


def _nth_set_bit(m: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Position of the (j+1)-th set bit of each uint32 in m (j 0-based).

    Branch-free binary search over prefix popcounts; undefined when
    j >= popcount(m) (callers mask those slots)."""
    pos = jnp.zeros_like(j)
    for width in (16, 8, 4, 2, 1):
        mask = jnp.uint32((1 << width) - 1)
        low = m & mask
        c = jax.lax.population_count(low).astype(j.dtype)
        go_hi = j >= c
        j = jnp.where(go_hi, j - c, j)
        pos = pos + jnp.where(go_hi, width, 0)
        m = jnp.where(go_hi, m >> jnp.uint32(width), low)
    return pos


def _compact_to_pool(occ, kk, t0, N, K, max_samples, pool_size,
                     exp_step_factor, dt_min, dt_max):
    """Deterministic compaction of occupied samples into a flat (pool_size,)
    pool ordered by (ray, t).

    occ: (N, K) candidate occupancy.  kk: (N, K) int32 fine chain-step index
    of each candidate.  t0: (N,) jittered chain start per ray — `ts` is
    reconstructed in the pool as the closed-form chain position `t(t0, k)`,
    bit-identical to the candidate's (same expression, same operands).

    At pool saturation, whole tail-of-batch rays drop out of the pool.
    This is deliberate: a ray with zero samples renders pure background with
    ZERO parameter gradient — a no-op for training, shrinking the effective
    batch.  The tempting alternative (clip every ray front-to-back to a
    proportional share) supervises only a shallow entry slab of the volume
    during grid warmup and measurably collapses novel-view quality
    (round 3 A/B: 23.5 vs 28.3 PSNR at 1536 steps).  Batch order is random,
    so the dropped set is an unbiased subsample.

    Scatter cost on TPU is per INPUT ROW (~9-14ns each, regardless of row
    width or drop masks), so the design minimizes scattered rows:

      stage 1 (scatter):  GROUPS of 32 consecutive candidates compact an
        8-lane int32 descriptor [ray | occ bitmask | 4x k-base | t0 bits]
        into rank order — N*K/32 rows, ~4x fewer than the previous
        8-candidate/18-lane scheme.
      stage 2 (gather):   each pool slot locates its source group via
        block-start marks + an inclusive running max (no per-sample scatter
        at all), then selects its sample from the group's occupancy bitmask
        with a branch-free n-th-set-bit search.
    """
    # per-ray occupied-sample cap + bookkeeping.  When the chain itself is
    # shorter than the cap the cap can never bind — skip the full-width
    # (N, K) prefix sum entirely (it is one of the larger VPU passes here)
    if K <= max_samples:
        rm_counts = occ.sum(axis=1, dtype=jnp.int32)
        counts = rm_counts
    else:
        occ_i = occ.astype(jnp.int32)
        incl = jnp.cumsum(occ_i, axis=1)
        slot = incl - occ_i                                    # excl. in-ray
        occ = occ & (slot < max_samples)
        rm_counts = jnp.minimum(incl[:, -1], max_samples)
        counts = rm_counts
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    total = jnp.minimum(jnp.sum(counts), pool_size).astype(jnp.int32)

    GRP = 32
    while K % GRP:
        GRP //= 2
    NG = N * K // GRP
    occ_g = occ.reshape(NG, GRP)
    lane_w = (jnp.uint32(1) << jnp.arange(GRP, dtype=jnp.uint32))
    bits = (occ_g.astype(jnp.uint32) * lane_w[None, :]).sum(
        axis=1, dtype=jnp.uint32)                              # (NG,)
    grp_any = bits != 0
    grp_rank = jnp.cumsum(grp_any.astype(jnp.int32)) - grp_any
    blocks = max(2 * (pool_size // GRP), 1)
    tgt = jnp.where(grp_any & (grp_rank < blocks), grp_rank, blocks)

    ray_of_grp = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, K // GRP)).reshape(NG)
    t0_of_grp = jnp.broadcast_to(t0[:, None], (N, K // GRP)).reshape(NG)
    # k base of each 8-candidate subgroup (lanes 0, 8, 16, 24)
    n_sub = max(GRP // 8, 1)
    kb = kk.reshape(NG, GRP)[:, ::8][:, :n_sub]                # (NG, <=4)
    if n_sub < 4:
        kb = jnp.pad(kb, ((0, 0), (0, 4 - n_sub)))
    payload = jnp.concatenate(
        [
            ray_of_grp[:, None],
            jax.lax.bitcast_convert_type(bits, jnp.int32)[:, None],
            kb,
            jax.lax.bitcast_convert_type(
                t0_of_grp.astype(jnp.float32), jnp.int32)[:, None],
            jnp.zeros((NG, 1), jnp.int32),
        ],
        axis=1,
    )                                                          # (NG, 8)
    staged = jnp.zeros((blocks, 8), jnp.int32).at[tgt].set(
        payload, mode="drop")

    s_bits = jax.lax.bitcast_convert_type(staged[:, 1], jnp.uint32)
    cnt_b = jax.lax.population_count(s_bits).astype(jnp.int32)  # (blocks,)
    start_b = jnp.cumsum(cnt_b) - cnt_b                        # excl cumsum

    # pool slot -> owning block: mark each nonempty block's start slot with
    # (block id, start), take the inclusive running max.  Nonempty blocks
    # have strictly increasing distinct starts, so max-marking is exact.
    P = pool_size
    b_ids = jnp.arange(blocks, dtype=jnp.int32)
    mark_ok = (cnt_b > 0) & (start_b < P)
    mtgt = jnp.where(mark_ok, start_b, P)
    b_of = jax.lax.cummax(
        jnp.zeros((P,), jnp.int32).at[mtgt].max(b_ids, mode="drop"))
    start_of = jax.lax.cummax(
        jnp.zeros((P,), jnp.int32).at[mtgt].max(start_b, mode="drop"))

    rows_p = staged[b_of]                                      # (P, 8) gather
    p_bits = jax.lax.bitcast_convert_type(rows_p[:, 1], jnp.uint32)
    j = jnp.arange(P, dtype=jnp.int32) - start_of
    bitpos = _nth_set_bit(p_bits, j)
    ksub = jnp.clip(bitpos >> 3, 0, 3)
    # branchless 4-way select (take_along_axis lowers to a per-row gather)
    kb_sel = jnp.zeros((P,), jnp.int32)
    for sub in range(4):
        kb_sel = jnp.where(ksub == sub, rows_p[:, 2 + sub], kb_sel)
    k = (kb_sel + (bitpos & 7)).astype(jnp.float32)
    t0_p = jax.lax.bitcast_convert_type(rows_p[:, 6], jnp.float32)

    pool_valid = jnp.arange(P, dtype=jnp.int32) < total
    pool_ts = jnp.where(
        pool_valid,
        _chain_t(t0_p, k, exp_step_factor, dt_min, dt_max), 0.0)
    pool_ray = jnp.where(pool_valid, rows_p[:, 0], N)
    pool_dts = jnp.clip(pool_ts * exp_step_factor, dt_min, dt_max)

    # counts actually represented in the pool (clip rays past the budget)
    in_pool_counts = jnp.clip(total - offsets, 0, counts).astype(jnp.int32)
    return (pool_ts, pool_dts, pool_ray, pool_valid, in_pool_counts, offsets,
            total, rm_counts)


@partial(
    jax.jit,
    static_argnames=(
        "cascades", "scale", "exp_step_factor", "grid_size", "max_samples",
        "pool_size", "chain_length", "skip_empty_span",
    ),
)
def march_rays_train(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    hits_t: jnp.ndarray,
    occ_grid: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    pool_size: int,
    chain_length: int = 0,
    skip_empty_span: bool = True,
    occ_rows: jnp.ndarray | None = None,
    win_rows: jnp.ndarray | None = None,
) -> MarchResults:
    """March all rays through occupied space into a flat sample pool.

    Mirrors `raymarching_train` (raymarching.cu:166-332): per-ray start
    jittered by `noise * dt` (raymarching.cu:195-198), chain stepping with
    occupancy tests, per-ray *occupied*-sample cap `max_samples`, samples
    packed contiguously per ray, rays ordered by index (the reference's output
    ray order is atomic-scheduling-dependent; ours is sorted — downstream
    consumers only rely on the CSR structure, custom_functions.py:125-128).

    `chain_length` bounds how many dt-chain steps (occupied OR empty) are
    evaluated per ray.  The reference's iteration count is unbounded; with
    exp_step_factor == 0 a chain of `max_samples` steps of dt_min already
    spans the full scene-box diagonal (sqrt(3) * 2 * scale <= sqrt(3) for
    scale <= 0.5), so the default chain_length == max_samples is exact there.
    For exponential stepping a longer chain may be needed to reach the far
    bound of large scenes; callers pass e.g. 2 * max_samples.
    """
    N = rays_o.shape[0]
    K = chain_length if chain_length > 0 else max_samples
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size

    t1 = hits_t[:, 0]
    t2 = hits_t[:, 1]
    hit = t1 >= 0
    if skip_empty_span and cascades == 1 and exp_step_factor == 0.0:
        t1s, t2s, span_steps = occupied_span(
            rays_o, rays_d, t1, t2, occ_grid,
            scale=scale, grid_size=grid_size, dt_min=dt_min)
        chain_demand = span_steps.max().astype(jnp.int32)
    else:
        t1s, t2s = t1, t2
        chain_demand = None                 # derive from fine occupancy below
    t0 = t1s + calc_dt(t1s, exp_step_factor, max_samples, grid_size, scale) * noise

    use_window_mc = (win_rows is not None
                     and (cascades > 1 or exp_step_factor > 0.0)
                     and K % J_MC == 0)
    if use_window_mc:
        occ, ts, dts = _occ_window_chain_mc(
            rays_o, rays_d, t0, K // J_MC, win_rows, cascades=cascades,
            scale=scale, grid_size=grid_size,
            exp_step_factor=exp_step_factor, dt_min=dt_min, dt_max=dt_max)
        in_range = hit[:, None] & (ts >= 0) & (ts < t2s[:, None])
    else:
        k = jnp.arange(K, dtype=jnp.float32)[None, :]          # (1, K)
        ts = _chain_t(t0[:, None], k, exp_step_factor, dt_min, dt_max)
        dts = jnp.clip(ts * exp_step_factor, dt_min, dt_max)
        in_range = hit[:, None] & (ts >= 0) & (ts < t2s[:, None])

        xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
        mip, n = _grid_coords(xyz, dts, cascades, scale, grid_size)
        if occ_rows is None:
            occ_rows = occupancy_lines(occ_grid)
        occ = occupancy_at_lines(occ_rows, mip, n, grid_size)
    occ = occ & in_range                                       # (N, K)

    kk = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]
    per_ray_need = jnp.max(jnp.where(occ, kk, 0), axis=1)      # (N,)
    chain_demand_q = _q99(per_ray_need)
    if chain_demand is None:
        # chain steps actually used: one past the last occupied step; K
        # itself signals possible truncation (the caller re-buckets up)
        chain_demand = jnp.max(per_ray_need).astype(jnp.int32)

    kk_all = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
    (pool_ts, pool_dts, pool_ray, pool_valid, in_pool_counts, offsets, total,
     rm_counts) = _compact_to_pool(
        occ, kk_all, t0, N, K, max_samples, pool_size, exp_step_factor,
        dt_min, dt_max)

    return MarchResults(
        ts=pool_ts,
        deltas=pool_dts,
        ray_idx=pool_ray,
        valid=pool_valid,
        counts=in_pool_counts,
        offsets=offsets,
        total=total,
        rm_counts=rm_counts,
        chain_demand=chain_demand,
        chain_demand_q=chain_demand_q,
    )


class StridedMarch(NamedTuple):
    """Per-ray strided sample block: ray r owns row r of each (N, S) array.

    The strided layout supersedes the CSR pool for the train path: every
    global-scan/scatter step of the CSR compaction (group scatter, pool
    cummax, per-slot source gather) becomes a LANE-axis op over (N, S) or
    (N, K/32) — measured ~4 ms cheaper per step at the bench shapes, and a
    ray can never be dropped at pool saturation (clipping is per-ray
    front-to-back, like the reference's per-ray max_samples cap,
    raymarching.cu:237-241)."""

    ts: jnp.ndarray        # (N, S) sample distances
    deltas: jnp.ndarray    # (N, S)
    valid: jnp.ndarray     # (N, S) bool
    counts: jnp.ndarray    # (N,) samples kept (<= S)
    rm_counts: jnp.ndarray  # (N,) occupied samples found (pre-clip)
    total: jnp.ndarray     # () int32 total kept samples
    chain_demand: jnp.ndarray    # () int32
    chain_demand_q: jnp.ndarray  # () int32


def _select_first_bits(occ: jnp.ndarray, S: int):
    """First-S selection over per-ray candidate bits, all lane-axis math.

    occ: (N, K) bool candidates (K % 32 == 0).  Returns (k (N, S) int32 chain
    index of the s-th occupied candidate, counts (N,), total (N,) pre-clip).

    Design: candidates pack into (N, K/32) uint32 groups; group popcount
    prefix sums locate, for each output slot s, the ONE group containing the
    (s+1)-th set bit (groups are disjoint count ranges, so membership is a
    two-sided compare — no searchsorted/top_k); a branch-free n-th-set-bit
    search finds the bit inside the group.  Cost is ~K/32 fused passes over
    (N, S) — no global scans, no scatters (vs jax.lax.top_k at (8192, 896):
    2.74 ms measured)."""
    N, K = occ.shape
    KG = K // 32
    assert KG * 32 == K, K
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    bits = jnp.sum(occ.reshape(N, KG, 32) * weights[None, None, :],
                   axis=-1, dtype=jnp.uint32)                  # (N, KG)
    cnt = jax.lax.population_count(bits).astype(jnp.int32)     # (N, KG)
    incl = jnp.cumsum(cnt, axis=1)
    excl = incl - cnt
    total = incl[:, -1]
    counts = jnp.minimum(total, S)

    s_row = jnp.arange(S, dtype=jnp.int32)[None, :]            # (1, S)
    bits_sel = jnp.zeros((N, S), jnp.uint32)
    base = jnp.zeros((N, S), jnp.int32)
    gbase = jnp.zeros((N, S), jnp.int32)
    for g in range(KG):
        m = (excl[:, g:g + 1] <= s_row) & (s_row < incl[:, g:g + 1])
        bits_sel = jnp.where(m, bits[:, g:g + 1], bits_sel)
        base = jnp.where(m, excl[:, g:g + 1], base)
        gbase = jnp.where(m, g * 32, gbase)
    bitpos = _nth_set_bit(bits_sel, s_row - base)
    return gbase + bitpos, counts, total


@partial(
    jax.jit,
    static_argnames=("cascades", "scale", "exp_step_factor", "grid_size",
                     "max_samples", "n_samples", "chain_length"),
)
def march_rays_train_strided(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    hits_t: jnp.ndarray,
    noise: jnp.ndarray,
    occ_grid: jnp.ndarray | None,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    max_samples: int,
    n_samples: int,            # S: per-ray sample budget (the strided width)
    chain_length: int,
    occ_rows: jnp.ndarray | None = None,
    win_rows: jnp.ndarray | None = None,
) -> StridedMarch:
    """Occupancy march into the strided (N, S) layout.

    Same candidate chain + occupancy bits as `march_rays_train`
    (raymarching.cu:166-332 semantics: jittered start, closed-form dt-chain,
    per-mip occupancy tests, front-to-back per-ray clipping) but compaction
    is per-ray into row r instead of CSR-packed — see StridedMarch.
    Uses the windowed 64B-gather occupancy path when `win_rows` is given
    (single cascade, uniform stepping), else packed z-line rows.
    """
    N = rays_o.shape[0]
    S = n_samples
    K = -(-chain_length // 32) * 32
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size

    t1 = hits_t[:, 0]
    t2 = hits_t[:, 1]
    hit = t1 >= 0
    t0 = t1 + calc_dt(t1, exp_step_factor, max_samples, grid_size, scale) * noise

    use_window = (win_rows is not None and exp_step_factor == 0.0
                  and cascades == 1 and K % SEGMENT_J == 0)
    use_window_mc = (win_rows is not None and not use_window
                     and (cascades > 1 or exp_step_factor > 0.0)
                     and K % J_MC == 0)
    if use_window:
        occ, ts_all = _occ_window_chain(
            rays_o, rays_d, t0, K // SEGMENT_J, win_rows,
            scale=scale, grid_size=grid_size, dt_min=dt_min)
        occ = occ.reshape(N, K)
        ts_all = ts_all.reshape(N, K)
        in_range = hit[:, None] & (ts_all >= 0) & (ts_all < t2[:, None])
    elif use_window_mc:
        occ, ts_all, _ = _occ_window_chain_mc(
            rays_o, rays_d, t0, K // J_MC, win_rows, cascades=cascades,
            scale=scale, grid_size=grid_size,
            exp_step_factor=exp_step_factor, dt_min=dt_min, dt_max=dt_max)
        in_range = hit[:, None] & (ts_all >= 0) & (ts_all < t2[:, None])
    else:
        k = jnp.arange(K, dtype=jnp.float32)[None, :]
        ts_all = _chain_t(t0[:, None], k, exp_step_factor, dt_min, dt_max)
        dts_all = jnp.clip(ts_all * exp_step_factor, dt_min, dt_max)
        in_range = hit[:, None] & (ts_all >= 0) & (ts_all < t2[:, None])
        xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
        mip, n = _grid_coords(xyz, dts_all, cascades, scale, grid_size)
        if occ_rows is None:
            occ_rows = occupancy_lines(occ_grid)
        occ = occupancy_at_lines(occ_rows, mip, n, grid_size)
    occ = occ & in_range                                        # (N, K)

    kk1 = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]
    per_ray_need = jnp.max(jnp.where(occ, kk1, 0), axis=1)
    chain_demand = jnp.max(per_ray_need).astype(jnp.int32)
    chain_demand_q = _q99(per_ray_need)

    k_idx, counts, total_pre = _select_first_bits(occ, S)
    s_row = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = s_row < counts[:, None]
    ts = _chain_t(t0[:, None], k_idx.astype(jnp.float32), exp_step_factor,
                  dt_min, dt_max)
    deltas = jnp.clip(ts * exp_step_factor, dt_min, dt_max)
    ts = jnp.where(valid, ts, 0.0)

    return StridedMarch(
        ts=ts,
        deltas=deltas,
        valid=valid,
        counts=counts,
        rm_counts=total_pre,
        total=counts.sum().astype(jnp.int32),
        chain_demand=chain_demand,
        chain_demand_q=chain_demand_q,
    )


def _qtile(per_ray_need: jnp.ndarray, q: float) -> jnp.ndarray:
    """q-th percentile of a per-ray integer demand vector.

    Budget feedback uses percentiles instead of the batch max: one grazing
    outlier ray would otherwise pin every static budget at its worst case.
    Rays above the percentile get their chain tail truncated — samples that
    sit behind ~hundreds of composited samples (T ~= 0)."""
    n = per_ray_need.shape[0]
    k = max(int(q * n) - 1, 0)
    return jnp.sort(per_ray_need)[k].astype(jnp.int32)


def _q99(per_ray_need: jnp.ndarray) -> jnp.ndarray:
    return _qtile(per_ray_need, 0.99)


@partial(
    jax.jit,
    static_argnames=(
        "scale", "grid_size", "max_samples", "pool_size", "chain_length",
        "n_intervals",
    ),
)
def march_rays_train_segments(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    hits_t: jnp.ndarray,
    occ_grid: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    scale: float,
    grid_size: int,
    max_samples: int,
    pool_size: int,
    chain_length: int,
    n_intervals: int,
    occ_rows: jnp.ndarray | None = None,
    dil_rows: jnp.ndarray | None = None,
) -> MarchResults:
    """Two-level segment march (single cascade, uniform stepping).

    Produces the SAME sample set as `march_rays_train` (bit-identical t
    values) with far fewer random-memory accesses — the TPU's per-gather cost
    (~2ns, no gather hardware) dominates the chain march, so the number of
    occupancy lookups is the metric that matters:

      level A: the dt-chain is cut into intervals of SEGMENT_J=8 fine steps;
        each interval's midpoint is tested against the 3^3-DILATED occupancy
        grid.  Dilation makes the single point test conservative: a fine
        sample can sit at most (J-1)/2 * dt_min < 1 cell from the midpoint,
        so `dilated(midpoint) == 0` proves every fine cell of the interval is
        empty.  Cost: chain_length/8 lookups per ray.
      select: the first `n_intervals` flagged intervals per ray (front-to-
        back, lax.top_k) — a static budget the caller re-buckets from the
        reported `interval_demand`, like the sample pool.
      level B: only the selected intervals' fine steps are tested against
        the TRUE grid.  Cost: n_intervals*8 lookups per ray.

    vs. the plain chain march (chain_length lookups/ray): for a converged
    occupancy grid this is a 4-8x lookup reduction at equal output.
    The reference's DDA skip (raymarching.cu:225-233) plays the same role on
    GPU; this is its two-level TPU re-design.  `chain_demand` reports
    interval demand * J so the caller's bucket feedback stays in chain units.
    """
    N = rays_o.shape[0]
    J = SEGMENT_J
    K_A = -(-chain_length // J)                   # coarse intervals per ray
    M = n_intervals
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size

    t1 = hits_t[:, 0]
    t2 = hits_t[:, 1]
    hit = t1 >= 0
    t0 = t1 + dt_min * noise                      # calc_dt == dt_min here

    if occ_rows is None:
        occ_rows = occupancy_lines(occ_grid)
    if dil_rows is None:
        dil_rows = occupancy_lines(dilate_grid(occ_grid))

    # --- level A: dilated midpoint test per interval --------------------
    c = jnp.arange(K_A, dtype=jnp.float32)[None, :]            # (1, K_A)
    m_t = t0[:, None] + (c * J + 0.5 * (J - 1)) * dt_min       # midpoints
    first_t = t0[:, None] + (c * J) * dt_min
    in_A = hit[:, None] & (first_t < t2[:, None]) & (first_t >= 0)
    xyz_A = rays_o[:, None, :] + m_t[..., None] * rays_d[:, None, :]
    u = (xyz_A / scale + 1.0) * 0.5 * grid_size
    n_A = jnp.clip(u, 0.0, grid_size - 1.0).astype(jnp.int32)
    mip_A = jnp.zeros((N, K_A), jnp.int32)
    occ_A = occupancy_at_lines(dil_rows, mip_A, n_A, grid_size) & in_A

    count_A = occ_A.sum(axis=1)                                # (N,)
    interval_demand = count_A.max().astype(jnp.int32)
    interval_demand_q = _q99(count_A)

    # --- select first M flagged intervals (front-to-back) ---------------
    keys = jnp.where(occ_A, -jnp.arange(K_A, dtype=jnp.int32)[None, :],
                     -(K_A + 1))
    _, cidx = jax.lax.top_k(keys, M)                           # (N, M) asc c
    sel_valid = jnp.arange(M)[None, :] < jnp.minimum(count_A, M)[:, None]

    # --- level B: fine chain inside selected intervals -------------------
    kk = (cidx[..., None] * J
          + jnp.arange(J, dtype=jnp.int32)[None, None, :])     # (N, M, J)
    ts = (t0[:, None, None]
          + kk.astype(jnp.float32) * dt_min).reshape(N, M * J)
    in_range = (hit[:, None] & sel_valid.repeat(J, axis=1)
                & (ts >= 0) & (ts < t2[:, None]))
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    uf = (xyz / scale + 1.0) * 0.5 * grid_size
    n_f = jnp.clip(uf, 0.0, grid_size - 1.0).astype(jnp.int32)
    mip_f = jnp.zeros((N, M * J), jnp.int32)
    occ = occupancy_at_lines(occ_rows, mip_f, n_f, grid_size) & in_range

    (pool_ts, pool_dts, pool_ray, pool_valid, in_pool_counts, offsets, total,
     rm_counts) = _compact_to_pool(
        occ, kk.reshape(N, M * J), t0, N, M * J, max_samples, pool_size, 0.0,
        dt_min, dt_max)

    return MarchResults(
        ts=pool_ts,
        deltas=pool_dts,
        ray_idx=pool_ray,
        valid=pool_valid,
        counts=in_pool_counts,
        offsets=offsets,
        total=total,
        rm_counts=rm_counts,
        chain_demand=(interval_demand * J).astype(jnp.int32),
        chain_demand_q=(interval_demand_q * J).astype(jnp.int32),
    )
