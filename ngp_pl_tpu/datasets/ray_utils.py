"""Ray generation and pose math.

Re-implements reference datasets/ray_utils.py.  Split by execution site:
- `get_ray_directions`, `average_poses`, `center_poses`,
  `create_spheric_poses` run host-side once at dataset load -> numpy.
- `get_rays` and `axisangle_to_R` run inside the jitted train step (camera
  poses can be trainable, reference train.py:117-122) -> jnp, differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_ray_directions(H, W, K, random=False, return_uv=False, flatten=True,
                       rng=None):
    """Per-pixel ray directions in camera frame [right down front]
    (reference ray_utils.py:8-42).

    K: (3, 3) intrinsics. Rays pass through pixel centers (+0.5) unless
    `random`, which jitters uniformly inside the pixel.
    Returns (H*W, 3) (or (H, W, 3) if not flatten), float32.
    """
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        rng = rng or np.random.default_rng()
        du = rng.random(u.shape, dtype=np.float32)
        dv = rng.random(v.shape, dtype=np.float32)
    else:
        du = dv = 0.5
    directions = np.stack(
        [(u - cx + du) / fx, (v - cy + dv) / fy, np.ones_like(u)], axis=-1
    ).astype(np.float32)
    uv = np.stack([u, v], axis=-1)
    if flatten:
        directions = directions.reshape(-1, 3)
        uv = uv.reshape(-1, 2)
    if return_uv:
        return directions, uv
    return directions


def get_rays(directions, c2w):
    """Camera-frame directions + c2w pose(s) -> world rays (jnp,
    differentiable; reference ray_utils.py:46-70).

    directions: (N, 3); c2w: (3, 4) or (N, 3, 4).
    Returns (rays_o (N, 3), rays_d (N, 3)) — rays_d NOT normalized, matching
    the reference (normalization happens in the model forward).
    """
    if c2w.ndim == 2:
        rays_d = directions @ c2w[:, :3].T
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nij,nj->ni", c2w[:, :, :3], directions)
        rays_o = c2w[:, :, 3]
    return rays_o, rays_d


def axisangle_to_R(v):
    """Axis-angle (B, 3) -> rotation matrices (B, 3, 3) via Rodrigues
    (jnp, differentiable; reference ray_utils.py:74-100)."""
    squeeze = v.ndim == 1
    if squeeze:
        v = v[None]
    zero = jnp.zeros_like(v[:, :1])
    skew = jnp.stack(
        [
            jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], axis=1),
            jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], axis=1),
            jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], axis=1),
        ],
        axis=1,
    )
    # safe norm: d|v|/dv is 0/0 = NaN at v = 0, and pose refinement STARTS
    # at dR = 0 (reference train.py:117-122) — sqrt(v.v + eps) has a zero,
    # finite gradient there
    theta = jnp.sqrt(jnp.sum(v * v, axis=1) + 1e-14)[:, None, None]
    eye = jnp.eye(3, dtype=v.dtype)[None]
    R = (
        eye
        + jnp.sin(theta) / theta * skew
        + (1 - jnp.cos(theta)) / theta ** 2 * (skew @ skew)
    )
    return R[0] if squeeze else R


def _normalize(v):
    return v / np.linalg.norm(v)


def average_poses(poses, pts3d=None):
    """Average c2w pose used for centering (reference ray_utils.py:108-145)."""
    center = pts3d.mean(0) if pts3d is not None else poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], axis=1)  # (3, 4)


def center_poses(poses, pts3d=None):
    """Recenter all poses by the inverse average pose
    (reference ray_utils.py:148-176)."""
    pose_avg = average_poses(poses, pts3d)
    pose_avg_h = np.eye(4)
    pose_avg_h[:3] = pose_avg
    inv = np.linalg.inv(pose_avg_h)
    last = np.tile([0, 0, 0, 1.0], (len(poses), 1, 1))
    poses_h = np.concatenate([poses, last], axis=1)
    centered = (inv @ poses_h)[:, :3]
    if pts3d is not None:
        pts3d_c = pts3d @ inv[:3, :3].T + inv[:3, 3]
        return centered, pts3d_c
    return centered


def create_spheric_poses(radius, mean_h, n_poses=120):
    """Circular camera path around +z (reference ray_utils.py:180-215)."""

    def pose(theta, phi, r):
        trans = np.array([[1, 0, 0, 0], [0, 1, 0, 2 * mean_h], [0, 0, 1, -r]],
                         dtype=np.float64)
        rot_phi = np.array(
            [[1, 0, 0],
             [0, np.cos(phi), -np.sin(phi)],
             [0, np.sin(phi), np.cos(phi)]])
        rot_theta = np.array(
            [[np.cos(theta), 0, -np.sin(theta)],
             [0, 1, 0],
             [np.sin(theta), 0, np.cos(theta)]])
        c2w = rot_theta @ rot_phi @ trans
        return np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0.0]]) @ c2w

    thetas = np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
    return np.stack([pose(t, -np.pi / 12, radius) for t in thetas]).astype(
        np.float32)
