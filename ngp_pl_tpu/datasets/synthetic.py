"""Procedural synthetic scene — an analytic volume with ground-truth renders.

No counterpart in the reference (which always loads data from disk); this
dataset exists so the framework can be trained, evaluated, and benchmarked
end-to-end in a hermetic environment: an analytic density/color field (soft
colored spheres in the scene box) is volume-rendered exactly to produce
training/test images in the NeRF-synthetic camera convention (cameras on a
radius-1.5 sphere looking at the origin, white background).
"""
from __future__ import annotations

import numpy as np

from ngp_pl_tpu.datasets.base import BaseDataset
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions

# (center, radius, rgb) of the analytic spheres, all inside [-0.4, 0.4]^3
_SPHERES = [
    (np.array([0.0, 0.0, 0.0]), 0.22, np.array([0.9, 0.25, 0.2])),
    (np.array([0.25, 0.15, -0.1]), 0.12, np.array([0.2, 0.8, 0.3])),
    (np.array([-0.22, -0.18, 0.15]), 0.1, np.array([0.25, 0.35, 0.95])),
    (np.array([0.05, -0.28, -0.2]), 0.09, np.array([0.95, 0.85, 0.2])),
]
_DENSITY = 800.0  # alpha ~= 0.74 per marched sample: rays terminate after a
                  # few surface samples like converged real scenes (Lego-class
                  # densities are O(10^2-10^3); at 120 a ray needed ~22
                  # samples to cross T=1e-2, an unrealistically soft regime)
_EDGE = 0.02   # soft edge width
_THICK = 0.05  # shell thickness — spheres are HOLLOW so the per-ray occupied
               # span (~2 thin crossings) matches real NeRF scenes like Lego
               # (thin structures, rm_s ~ 30-60/ray), not a solid blob whose
               # interior would march hundreds of samples per ray


def _shell(d: np.ndarray, radius: float):
    outer = np.clip((radius - d) / _EDGE, 0.0, 1.0)
    inner = np.clip((d - (radius - _THICK)) / _EDGE, 0.0, 1.0)
    return outer * inner


def field(xyz: np.ndarray):
    """Analytic (sigma, rgb) at positions (N, 3)."""
    sigma = np.zeros(xyz.shape[0], np.float32)
    rgb = np.ones((xyz.shape[0], 3), np.float32)
    weight = np.zeros(xyz.shape[0], np.float32)
    for center, radius, color in _SPHERES:
        d = np.linalg.norm(xyz - center[None], axis=-1)
        inside = _shell(d, radius)
        sigma = np.maximum(sigma, _DENSITY * inside)
        new = inside > weight
        rgb[new] = color
        weight = np.maximum(weight, inside)
    return sigma, rgb


def _lookat_pose(cam_pos: np.ndarray) -> np.ndarray:
    """c2w with camera axes [right down front] looking at the origin."""
    forward = -cam_pos / np.linalg.norm(cam_pos)          # front = towards origin
    up_world = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up_world)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    return np.stack([right, down, forward, cam_pos], axis=1).astype(np.float32)


_GT_CACHE = {}


def _jax_gt_renderer(n_steps, t_near, t_far, world_scale=1.0, bg=1.0):
    """Jitted exact renderer of the analytic field (scan over depth).

    world_scale ws scales the scene geometrically (centers, radii, edge
    widths x ws) with sigma / ws so optical depths — and therefore the
    rendered images — are invariant: the SAME scene at ws=4 spans
    [-1.6, 1.6]^3 and exercises the multi-cascade / exp-stepping render
    paths (reference scale>0.5 recipes, benchmark_mipnerf360.sh)."""
    import jax
    import jax.numpy as jnp

    ws = float(world_scale)
    centers = jnp.asarray(np.stack([s[0] for s in _SPHERES]), jnp.float32) * ws
    radii = jnp.asarray([s[1] for s in _SPHERES], jnp.float32) * ws
    colors = jnp.asarray(np.stack([s[2] for s in _SPHERES]), jnp.float32)
    ts = jnp.linspace(t_near, t_far, n_steps, dtype=jnp.float32)
    dt = float(ts[1] - ts[0])

    def jfield(xyz):
        d = jnp.linalg.norm(xyz[:, None, :] - centers[None], axis=-1)
        outer = jnp.clip((radii[None] - d) / (_EDGE * ws), 0.0, 1.0)  # (N, S)
        inner = jnp.clip((d - (radii[None] - _THICK * ws)) / (_EDGE * ws),
                         0.0, 1.0)
        inside = outer * inner
        sigma = (_DENSITY / ws) * inside.max(axis=1)
        best = jnp.argmax(inside, axis=1)
        rgb = jnp.where(inside.max(axis=1)[:, None] > 0,
                        colors[best], 1.0)
        return sigma, rgb

    @jax.jit
    def render(rays_o, d):
        def body(carry, t):
            rgb_acc, depth_acc, T = carry
            sigma, rgb = jfield(rays_o + t * d)
            alpha = 1.0 - jnp.exp(-sigma * dt)
            w = alpha * T
            return (rgb_acc + w[:, None] * rgb, depth_acc + w * t,
                    T * (1.0 - alpha)), None

        N = rays_o.shape[0]
        init = (jnp.zeros((N, 3)), jnp.zeros(N), jnp.ones(N))
        (rgb_acc, depth_acc, T), _ = jax.lax.scan(body, init, ts)
        return rgb_acc + bg * T[:, None], depth_acc, 1.0 - T

    return render


def render_gt(rays_o, rays_d, n_steps=384, t_near=0.6, t_far=2.6,
              world_scale=1.0, bg=1.0):
    """Exact dense volume render of the analytic field (white background).

    Host-side data prep: pinned to the CPU backend so it never pays a remote
    TPU compile."""
    import jax

    key = (n_steps, t_near, t_far, world_scale, bg)
    if key not in _GT_CACHE:
        _GT_CACHE[key] = _jax_gt_renderer(n_steps, t_near, t_far,
                                          world_scale, bg)
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        rgb, depth, opacity = _GT_CACHE[key](
            np.ascontiguousarray(rays_o, np.float32), d.astype(np.float32))
    return np.asarray(rgb), np.asarray(depth), np.asarray(opacity)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class SyntheticDataset(BaseDataset):
    """Hermetic procedural dataset in the BaseDataset contract."""

    def __init__(self, root_dir="", split="train", downsample=1.0,
                 img_size=128, n_train=24, n_test=4, seed=0,
                 world_scale=1.0, bg=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        w = h = int(img_size * downsample)
        f = 1.2 * w
        self.K = np.float32([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        self.img_wh = (w, h)
        self.directions = get_ray_directions(h, w, self.K)
        self.world_scale = float(world_scale)

        rng = np.random.default_rng(seed if split.startswith("train") else seed + 1)
        n = n_train if split.startswith("train") else n_test
        poses = []
        for i in range(n):
            theta = 2 * np.pi * i / n + rng.uniform(0, 0.1)
            phi = np.deg2rad(rng.uniform(-55, -15))
            cam = 1.5 * self.world_scale * np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                -np.sin(phi),
            ])
            poses.append(_lookat_pose(cam))
        self.poses = np.stack(poses)

        if kwargs.get("read_meta", True):
            rays = []
            for pose in self.poses:
                rd = self.directions @ pose[:, :3].T
                ro = np.broadcast_to(pose[:, 3], rd.shape)
                rgb, _, _ = render_gt(
                    ro, rd, t_near=0.6 * self.world_scale,
                    t_far=2.6 * self.world_scale,
                    world_scale=self.world_scale, bg=bg)
                rays.append(rgb)
            self.rays = np.stack(rays).astype(np.float32)
