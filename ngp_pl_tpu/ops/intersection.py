"""Ray/AABB and ray/sphere intersection.

Replaces the reference CUDA kernels (reference models/csrc/intersection.cu).
The reference launches a thread per (ray, voxel) with an atomic hit counter
then sorts hits by near-t; on TPU the same thing is a broadcasted slab test —
pure vectorized math, top-k by near-t — fully deterministic.

The main render path only ever intersects the single scene box with max_hits=1
(reference models/rendering.py:26-29), for which `ray_aabb_intersect_single`
is the fused fast path.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _slab_test(rays_o, inv_d, centers, half_sizes):
    """Slab test per (ray, box): returns (t1, t2) with t1 > t2 meaning miss.

    rays_o: (N, 3); inv_d: (N, 3); centers/half_sizes: (V, 3).
    Returns (N, V) near/far.  Mirrors intersection.cu:5-22.
    """
    o = rays_o[:, None, :]          # (N, 1, 3)
    inv = inv_d[:, None, :]
    t_min = (centers[None] - half_sizes[None] - o) * inv
    t_max = (centers[None] + half_sizes[None] - o) * inv
    lo = jnp.minimum(t_min, t_max)
    hi = jnp.maximum(t_min, t_max)
    t1 = lo.max(axis=-1)
    t2 = hi.min(axis=-1)
    return t1, t2


def ray_aabb_intersect_single(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    center: jnp.ndarray,
    half_size: jnp.ndarray,
) -> jnp.ndarray:
    """Intersect rays with ONE box. Returns hits_t (N, 2); -1 rows = miss.

    Matches the reference main path semantics (intersection.cu:48-55): near
    clamped to 0, rows with t2 <= 0 or t1 > t2 marked (-1, -1).
    """
    inv_d = 1.0 / rays_d
    t1, t2 = _slab_test(rays_o, inv_d, center.reshape(1, 3),
                        half_size.reshape(1, 3))
    t1, t2 = t1[:, 0], t2[:, 0]
    hit = (t1 <= t2) & (t2 > 0)
    near = jnp.maximum(t1, 0.0)
    return jnp.where(hit[:, None],
                     jnp.stack([near, t2], axis=-1),
                     jnp.full((rays_o.shape[0], 2), -1.0, rays_o.dtype))


def ray_aabb_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    centers: jnp.ndarray,
    half_sizes: jnp.ndarray,
    max_hits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full multi-voxel variant (intersection.cu:60-105).

    Returns (hits_cnt (N,), hits_t (N, max_hits, 2), hits_voxel_idx
    (N, max_hits)), hits sorted near-to-far, -1 padding for misses.
    """
    inv_d = 1.0 / rays_d
    t1, t2 = _slab_test(rays_o, inv_d, centers, half_sizes)   # (N, V)
    hit = (t1 <= t2) & (t2 > 0)
    near = jnp.where(hit, jnp.maximum(t1, 0.0), jnp.inf)
    # sort hits near-to-far; misses (inf) go last
    order = jnp.argsort(near, axis=1)[:, :max_hits]           # (N, max_hits)
    near_s = jnp.take_along_axis(near, order, axis=1)
    far_s = jnp.take_along_axis(t2, order, axis=1)
    hit_s = jnp.take_along_axis(hit, order, axis=1)
    hits_t = jnp.where(hit_s[..., None],
                       jnp.stack([near_s, far_s], axis=-1), -1.0)
    hits_idx = jnp.where(hit_s, order, -1)
    return hit.sum(axis=1).astype(jnp.int32), hits_t, hits_idx


def ray_sphere_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    max_hits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quadratic ray/sphere intersection (intersection.cu:103-197).

    centers: (S, 3); radii: (S,) or (S, 3) (reference passes per-axis radii but
    uses the first component).  Same output contract as ray_aabb_intersect.
    """
    radii = radii.reshape(radii.shape[0], -1)[:, 0]           # (S,)
    oc = rays_o[:, None, :] - centers[None]                    # (N, S, 3)
    a = jnp.sum(rays_d * rays_d, axis=-1)[:, None]             # (N, 1)
    b = 2.0 * jnp.sum(oc * rays_d[:, None, :], axis=-1)        # (N, S)
    c = jnp.sum(oc * oc, axis=-1) - radii[None] ** 2
    disc = b * b - 4 * a * c
    hit = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    hit = hit & (t2 > 0)
    near = jnp.where(hit, jnp.maximum(t1, 0.0), jnp.inf)
    order = jnp.argsort(near, axis=1)[:, :max_hits]
    near_s = jnp.take_along_axis(near, order, axis=1)
    far_s = jnp.take_along_axis(t2, order, axis=1)
    hit_s = jnp.take_along_axis(hit, order, axis=1)
    hits_t = jnp.where(hit_s[..., None],
                       jnp.stack([near_s, far_s], axis=-1), -1.0)
    hits_idx = jnp.where(hit_s, order, -1)
    return hit.sum(axis=1).astype(jnp.int32), hits_t, hits_idx
