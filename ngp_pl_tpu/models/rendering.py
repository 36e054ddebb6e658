"""Rendering pipeline: AABB intersect -> march -> field -> composite.

Re-designs reference models/rendering.py (render / __render_rays_train /
__render_rays_test).  Both paths share the deterministic pool marcher; the
test path additionally chunks rays host-side to bound memory (the reference
instead runs an adaptive alive-ray loop, rendering.py:75-105 — the chunked
full-march is simpler and the early-termination mask already skips dead
samples' contribution; a compacted alive-ray loop is a later perf pass).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import (
    MAX_SAMPLES,
    NEAR_DISTANCE,
    SQRT3,
    NGPConfig,
    RenderConfig,
)
from ngp_pl_tpu.models.ngp import NGP
from ngp_pl_tpu.ops.intersection import ray_aabb_intersect_single
from ngp_pl_tpu.ops.ray_march import march_rays_train
from ngp_pl_tpu.ops.volume_render import composite_train


def scene_hits(rays_o, rays_d, scale: float):
    """Intersect with the scene box and clamp the near plane
    (reference rendering.py:26-29)."""
    center = jnp.zeros((3,), rays_o.dtype)
    half = jnp.full((3,), scale, rays_o.dtype)
    hits_t = ray_aabb_intersect_single(rays_o, rays_d, center, half)
    near = hits_t[:, 0]
    near = jnp.where((near >= 0) & (near < NEAR_DISTANCE), NEAR_DISTANCE, near)
    return jnp.stack([near, hits_t[:, 1]], axis=-1)


def compute_scene_chain_length(poses, directions, scale: float,
                               exp_step_factor: float,
                               max_samples: int = MAX_SAMPLES,
                               grid_size: int = 128,
                               subsample: int = 4096) -> int:
    """Static dt-chain bound for a scene: the longest in-box ray segment any
    training ray can have, in chain steps (rounded up to 128).

    The chain is a static shape under jit; sizing it to the scene's actual
    max range instead of the worst-case box diagonal cuts march work 25-60%.
    """
    import math as _math

    dt_min = float(SQRT3) / max_samples
    dt_max = float(SQRT3) * 2 * scale / grid_size
    poses = np.asarray(poses)
    directions = np.asarray(directions)
    if directions.shape[0] > subsample:
        step = directions.shape[0] // subsample
        directions = directions[::step]
    t1_min, range_max = np.inf, 0.0
    for pose in poses:
        rd = directions @ pose[:, :3].T
        ro = pose[:, 3][None, :]
        inv = 1.0 / rd
        lo = (-scale - ro) * inv
        hi = (scale - ro) * inv
        t1 = np.minimum(lo, hi).max(axis=1)
        t2 = np.maximum(lo, hi).min(axis=1)
        hit = (t1 <= t2) & (t2 > 0)
        if not hit.any():
            continue
        near = np.maximum(t1[hit], NEAR_DISTANCE)
        t1_min = min(t1_min, float(near.min()))
        range_max = max(range_max, float((t2[hit] - near).max()))
    if not np.isfinite(t1_min) or range_max <= 0:
        return max_samples
    if exp_step_factor == 0.0:
        steps = int(_math.ceil(range_max / dt_min))
    else:
        # simulate the clamped-geometric chain from the most pessimistic start
        t, steps, t_end = t1_min, 0, t1_min + range_max
        while t < t_end and steps < 4 * max_samples:
            t += min(max(t * exp_step_factor, dt_min), dt_max)
            steps += 1
    steps = min(int(-(-steps // 128) * 128) + 128, 2 * max_samples)
    return max(steps, 128)


def render_rays_train(
    ngp: NGP,
    params,
    occ_grid: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise: jnp.ndarray,
    bg_rgb: jnp.ndarray,          # (3,) background color
    *,
    rcfg: RenderConfig,
    exposure: Optional[jnp.ndarray] = None,   # (N_rays, 1) HDR exposure
    pool_mult: Optional[int] = None,          # override rcfg.train_pool_mult
    chain_length: int = 0,                    # override the dt-chain bound
) -> Dict[str, jnp.ndarray]:
    """Differentiable train-time render (reference rendering.py:121-163).

    Gradients flow to params and to rays_o/rays_d (sample positions are
    recomputed as o + t*d with t stopped, which reproduces the reference
    RayMarcher backward's segment-sum ray gradients for free,
    custom_functions.py:102-112).
    """
    cfg = ngp.cfg
    N = rays_o.shape[0]
    hits_t = scene_hits(rays_o, rays_d, cfg.scale)
    pool_size = N * (pool_mult or rcfg.train_pool_mult)

    m = march_rays_train(
        jax.lax.stop_gradient(rays_o),
        jax.lax.stop_gradient(rays_d),
        jax.lax.stop_gradient(hits_t),
        occ_grid,
        noise,
        cascades=cfg.cascades,
        scale=cfg.scale,
        exp_step_factor=cfg.exp_step_factor,
        grid_size=cfg.grid_size,
        max_samples=rcfg.max_samples,
        pool_size=pool_size,
        chain_length=chain_length or (
            rcfg.max_samples if cfg.exp_step_factor == 0
            else 2 * rcfg.max_samples),
    )

    ridx = jnp.clip(m.ray_idx, 0, N - 1)
    xyz = rays_o[ridx] + m.ts[:, None] * rays_d[ridx]
    dirs = rays_d[ridx]
    sample_exposure = exposure[ridx] if exposure is not None else None
    sigmas, rgbs = ngp.forward(params, xyz, dirs, exposure=sample_exposure)

    out = composite_train(
        sigmas, rgbs, m.deltas, m.ts, m.ray_idx, m.valid, m.offsets,
        n_rays=N, T_threshold=rcfg.t_threshold,
    )
    out["rgb"] = out["rgb"] + bg_rgb[None, :] * (1.0 - out["opacity"][:, None])
    out["deltas"] = m.deltas
    out["ts"] = m.ts
    out["ray_idx"] = m.ray_idx
    out["pool_valid"] = m.valid
    out["offsets"] = m.offsets
    out["rm_samples"] = m.total
    out["rm_counts"] = m.rm_counts
    out["vr_samples"] = out["vr_samples"].sum()
    return out


def make_test_renderer(ngp: NGP, rcfg: RenderConfig, chunk: int = 16384,
                       pool_mult: int = 64):
    """Build a no-grad chunked whole-image renderer (reference
    rendering.py:31-36 test path + test.ipynb usage)."""
    cfg = ngp.cfg

    @jax.jit
    def _render_chunk(params, occ_grid, rays_o, rays_d):
        N = rays_o.shape[0]
        hits_t = scene_hits(rays_o, rays_d, cfg.scale)
        m = march_rays_train(
            rays_o, rays_d, hits_t, occ_grid,
            jnp.zeros((N,), rays_o.dtype),    # no start jitter at test time
            cascades=cfg.cascades,
            scale=cfg.scale,
            exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size,
            max_samples=rcfg.max_samples,
            pool_size=N * pool_mult,
            chain_length=(rcfg.max_samples if cfg.exp_step_factor == 0
                          else 2 * rcfg.max_samples),
        )
        ridx = jnp.clip(m.ray_idx, 0, N - 1)
        xyz = rays_o[ridx] + m.ts[:, None] * rays_d[ridx]
        sigmas, rgbs = ngp.forward(params, xyz, rays_d[ridx])
        out = composite_train(
            sigmas, rgbs, m.deltas, m.ts, m.ray_idx, m.valid, m.offsets,
            n_rays=N, T_threshold=rcfg.test_t_threshold,
        )
        return out["rgb"], out["depth"], out["opacity"], out["vr_samples"].sum()

    def render_image(params, occ_grid, rays_o, rays_d,
                     bg_color: float | np.ndarray = None):
        """rays (N, 3) -> dict of numpy rgb/depth/opacity.

        bg: white for synthetic (exp_step_factor == 0), else black
        (reference rendering.py:107-113)."""
        if bg_color is None:
            bg_color = 1.0 if cfg.exp_step_factor == 0 else 0.0
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (3,))
        N = rays_o.shape[0]
        rgbs, depths, opacities = [], [], []
        total_samples = 0
        for i in range(0, N, chunk):
            ro = jnp.asarray(rays_o[i:i + chunk])
            rd = jnp.asarray(rays_d[i:i + chunk])
            pad = chunk - ro.shape[0]
            if pad:
                ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            rgb, depth, opa, ns = _render_chunk(params, occ_grid, ro, rd)
            n = min(chunk, N - i)
            rgbs.append(np.asarray(rgb[:n]))
            depths.append(np.asarray(depth[:n]))
            opacities.append(np.asarray(opa[:n]))
            total_samples += int(ns)
        rgb = np.concatenate(rgbs)
        opacity = np.concatenate(opacities)
        rgb = rgb + np.asarray(bg)[None, :] * (1.0 - opacity[:, None])
        return {
            "rgb": rgb,
            "depth": np.concatenate(depths),
            "opacity": opacity,
            "total_samples": total_samples,
        }

    return render_image
