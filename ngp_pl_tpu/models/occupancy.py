"""Occupancy ("density") grid lifecycle.

Re-designs the reference grid maintenance (reference models/networks.py:155-269)
as pure jitted functions over an explicit state pytree:

- `mark_invisible_cells`: one-time camera-coverage pass; cells seen by no
  camera get density -1 permanently (networks.py:197-238).
- `update_density_grid`: EMA-decayed refresh of sampled cells + occupancy
  threshold (networks.py:240-269), every 16 steps during training
  (reference train.py:159-163).

Differences from the CUDA design, on purpose:
- the grid lives in plain row-major (x, y, z) order, not Morton order (the
  TPU marcher gathers bytes directly; ops.morton exists for interop);
- occupancy is one uint8 per cell, not a bitfield; `export_bitfield` emits the
  reference-format Morton bitfield for checkpoint parity;
- cell selection is a phase-cycled sublattice refresh instead of the
  reference's uniform+occupied random sampling (networks.py:169-195) — see
  update_density_grid's docstring for the equivalence argument.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ngp_pl_tpu.config import NEAR_DISTANCE, NGPConfig
from ngp_pl_tpu.ops.grid_ops import packbits
from ngp_pl_tpu.ops.morton import morton3d
from ngp_pl_tpu.ops.ray_march import (
    WIN_B,
    WIN_WORDS,
    dilate_lines,
    occupancy_lines,
    occupancy_windows,
)


class OccupancyGridState(NamedTuple):
    density_grid: jnp.ndarray   # (C, G^3) fp32; -1 = permanently invisible
    count_grid: jnp.ndarray     # (C, G^3) fp32 camera-coverage fraction
    occ_grid: jnp.ndarray       # (C, G, G, G) uint8, the marcher's input
    mean_density: jnp.ndarray   # () fp32
    # derived, refreshed with occ_grid so the per-step march never repacks:
    occ_rows: jnp.ndarray       # (C*G*G, W) uint32 bit-packed z-lines
    dil_rows: jnp.ndarray       # same, 3^3-dilated (segment-march level A)
    win_rows: jnp.ndarray       # (C*(G/4)^3, 16) packed 8^3 windows


def grid_rows(occ_grid: jnp.ndarray, cascades: int, grid_size: int):
    """(occ_rows, dil_rows, win_rows) packed forms of the occupancy grid.

    All three derive from the bit-packed z-lines with shift/mask math — the
    uint8 grid is read exactly once per refresh."""
    from ngp_pl_tpu.ops.ray_march import occupancy_windows_from_rows

    rows = occupancy_lines(occ_grid)
    return (rows, dilate_lines(rows, cascades, grid_size),
            occupancy_windows_from_rows(rows, cascades, grid_size))


def init_grid_state(cfg: NGPConfig) -> OccupancyGridState:
    C, G = cfg.cascades, cfg.grid_size
    W = max(1, (G + 31) // 32)
    return OccupancyGridState(
        density_grid=jnp.zeros((C, G ** 3), jnp.float32),
        count_grid=jnp.zeros((C, G ** 3), jnp.float32),
        occ_grid=jnp.zeros((C, G, G, G), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        occ_rows=jnp.zeros((C * G * G, W), jnp.uint32),
        dil_rows=jnp.zeros((C * G * G, W), jnp.uint32),
        win_rows=jnp.zeros((C * (G // WIN_B) ** 3, WIN_WORDS), jnp.uint32),
    )


def _all_cell_coords(G: int) -> jnp.ndarray:
    """(G^3, 3) int32 coords in row-major (x, y, z) order — flat index
    (x*G + y)*G + z matches ops.ray_march.occupancy_at."""
    r = jnp.arange(G, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def _cascade_world_pos(coords: jnp.ndarray, c: int, cfg: NGPConfig):
    """Cell-center world positions for cascade c (networks.py:251-253).

    Returns (pos (M, 3) fp32, half_grid_size float)."""
    s = min(2.0 ** (c - 1), cfg.scale)
    half = s / cfg.grid_size
    pos = (coords.astype(jnp.float32) / (cfg.grid_size - 1) * 2.0 - 1.0) * (s - half)
    return pos, half


@partial(jax.jit, static_argnames=("cfg", "img_w", "img_h", "chunk"))
def mark_invisible_cells(
    state: OccupancyGridState,
    K: jnp.ndarray,             # (3, 3) intrinsics
    poses: jnp.ndarray,         # (N_cams, 3, 4) c2w
    *,
    cfg: NGPConfig,
    img_w: int,
    img_h: int,
    chunk: int = 2 ** 16,
) -> OccupancyGridState:
    """Project every cell into every camera (networks.py:197-238)."""
    G, C = cfg.grid_size, cfg.cascades
    N_cams = poses.shape[0]
    w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)             # (N, 3, 3)
    w2c_T = -jnp.einsum("nij,nj->ni", w2c_R, poses[:, :3, 3])  # (N, 3)
    KR = jnp.einsum("ij,njk->nik", K, w2c_R)                 # (N, 3, 3)
    KT = jnp.einsum("ij,nj->ni", K, w2c_T)                   # (N, 3)

    coords = _all_cell_coords(G)                             # (G^3, 3)

    density = state.density_grid
    count = state.count_grid
    for c in range(C):
        pos, _ = _cascade_world_pos(coords, c, cfg)          # (G^3, 3)

        def body(chunk_pos):
            uvd = jnp.einsum("nij,mj->nmi", KR, chunk_pos) + KT[:, None, :]
            z = uvd[..., 2]                                  # (N, m)
            uv = uvd[..., :2] / jnp.where(jnp.abs(z[..., None]) > 1e-10,
                                          z[..., None], 1e-10)
            in_image = (
                (z >= 0)
                & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
                & (uv[..., 1] >= 0) & (uv[..., 1] < img_h)
            )
            covered = (z >= NEAR_DISTANCE) & in_image        # (N, m)
            too_near = (z < NEAR_DISTANCE) & in_image
            cnt = covered.sum(axis=0).astype(jnp.float32) / N_cams
            valid = (cnt > 0) & ~too_near.any(axis=0)
            return cnt, jnp.where(valid, 0.0, -1.0)

        M = pos.shape[0]
        pad = (-M) % chunk
        pos_p = jnp.pad(pos, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        cnt, dens = jax.lax.map(body, pos_p)
        count = count.at[c].set(cnt.reshape(-1)[:M])
        density = density.at[c].set(dens.reshape(-1)[:M])

    return state._replace(density_grid=density, count_grid=count)


def _coords_from_flat(idx: jnp.ndarray, G: int) -> jnp.ndarray:
    x = idx // (G * G)
    y = (idx // G) % G
    z = idx % G
    return jnp.stack([x, y, z], axis=-1)


def make_update_density_grid(ngp, cfg: NGPConfig, chunk: int = 2 ** 18):
    """Build the jitted update fn closed over the model (networks.py:240-269)."""

    def density_chunked(params, pos):
        M = pos.shape[0]
        if M <= chunk:
            return ngp.density(params, pos)
        pad = (-M) % chunk
        pos_p = jnp.pad(pos, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        out = jax.lax.map(lambda p: ngp.density(params, p), pos_p)
        return out.reshape(-1)[:M]

    @partial(jax.jit, static_argnames=("warmup", "erode"))
    def update_density_grid(
        params,
        state: OccupancyGridState,
        key,
        density_threshold: jnp.ndarray,
        *,
        warmup: bool,
        erode: bool = False,
        decay: float = 0.95,
        phase=0,                 # traced (one program for all 4 phases)
    ) -> OccupancyGridState:
        """One EMA refresh of the density grid (networks.py:240-269).

        TPU redesign of the cell selection: the reference draws M=G^3/4
        uniform + M occupied-biased random cells (networks.py:243-247),
        which on TPU costs an occupied-list compaction scatter, ~1M narrow
        `tmp` scatters, and 2M density evals per update.  Here each update
        refreshes the SUBLATTICE of cells with flat index = `phase` (mod 4)
        — callers rotate phase round-robin — so every cell refreshes exactly
        every 4 updates (64 steps) instead of in expectation every 4 (the
        uniform half) with an occupied-biased boost.  Writes become a dense
        slice-set on a free (C, G^3/4, 4) view (zero scatters) and evals
        halve to G^3/4.  Kill latency for newly-empty cells is unchanged:
        it is EMA-decay-bound in both designs (grid = max(grid*decay, new)).
        """
        G, C = cfg.grid_size, cfg.cascades
        grid = state.density_grid
        n4 = G ** 3 // 4

        tmp_phase = []
        for c in range(C):
            key, k_noise = jax.random.split(key)
            if warmup:
                idx = jnp.arange(G ** 3, dtype=jnp.int32)
            else:
                idx = phase + 4 * jnp.arange(n4, dtype=jnp.int32)
            coords = _coords_from_flat(idx, G)
            pos, half = _cascade_world_pos(coords, c, cfg)
            # jitter inside the cell (networks.py:254-255)
            noise = jax.random.uniform(k_noise, pos.shape, minval=-1.0,
                                       maxval=1.0) * half
            sigma = density_chunked(params, pos + noise)
            # Failure containment (r5): a single NaN density poisons the EMA
            # permanently (max(grid*decay, NaN) == NaN) and a NaN
            # mean_density makes `new_grid > thr` all-False — the ENTIRE
            # occupancy grid empties and training silently collapses (the
            # 30k-run quality decay).  NaN -> 0 (keep the EMA's old value);
            # +inf -> 1e10 (the cell IS dense).
            sigma = jnp.nan_to_num(sigma, nan=0.0, posinf=1e10, neginf=0.0)
            tmp_phase.append(sigma)

        if warmup:
            tmp = jnp.stack(tmp_phase)                        # (C, G^3)
        else:
            # dense write of the refreshed sublattice: (C, G^3) viewed as
            # (C, G^3/4, 4), column `phase` set, reshape back — no scatter
            tmp = (jnp.zeros((C, n4, 4), jnp.float32)
                   .at[:, :, phase].set(jnp.stack(tmp_phase))
                   .reshape(C, G ** 3))

        if erode:
            # decay more the cells visible to few cameras (networks.py:258-260)
            decay_arr = jnp.clip(
                decay ** (1.0 / jnp.maximum(state.count_grid, 1e-10)), 0.1, decay
            )
        else:
            decay_arr = decay
        new_grid = jnp.where(grid < 0, grid, jnp.maximum(grid * decay_arr, tmp))

        pos_mask = new_grid > 0
        mean_density = jnp.sum(jnp.where(pos_mask, new_grid, 0.0)) / jnp.maximum(
            jnp.sum(pos_mask), 1
        )
        thr = jnp.minimum(mean_density, density_threshold)
        occ = (new_grid > thr).astype(jnp.uint8).reshape(C, G, G, G)
        occ_rows, dil_rows, win_rows = grid_rows(occ, C, G)
        return OccupancyGridState(
            density_grid=new_grid,
            count_grid=state.count_grid,
            occ_grid=occ,
            mean_density=mean_density,
            occ_rows=occ_rows,
            dil_rows=dil_rows,
            win_rows=win_rows,
        )

    return update_density_grid


def export_bitfield(state: OccupancyGridState, cfg: NGPConfig) -> jnp.ndarray:
    """Morton-ordered uint8 bitfield in the reference layout
    (C * G^3 / 8 bytes, networks.py:28-29) for checkpoint interop."""
    G, C = cfg.grid_size, cfg.cascades
    coords = _all_cell_coords(G)
    m = morton3d(coords).astype(jnp.int32)                   # row-major -> morton
    thr = jnp.minimum(state.mean_density, jnp.inf)
    out = []
    for c in range(C):
        morton_grid = jnp.zeros((G ** 3,), jnp.float32).at[m].set(
            state.density_grid[c])
        occ_flags = state.occ_grid[c].reshape(-1)
        morton_occ = jnp.zeros((G ** 3,), jnp.uint8).at[m].set(occ_flags)
        out.append(packbits(morton_occ.astype(jnp.float32), 0.5))
        del morton_grid, thr
    return jnp.concatenate(out)
