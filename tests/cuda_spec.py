"""Executable behavioral spec of the reference CUDA kernels.

Straight sequential re-derivations of the reference kernel semantics
(models/csrc/raymarching.cu:166-332, volumerendering.cu:6-202,
losses.cu:9-175) written per-ray / per-sample with explicit Python loops —
deliberately NOT sharing structure with either the repo's vectorized TPU
ops or the vectorized NumPy helpers the unit tests use.  The march follows
the kernel's while-loop with DDA empty-space skipping; the compositor
backward uses explicit suffix sums instead of the accumulated-color trick;
the distortion loss is the O(n^2) pairwise definition instead of the
prefix-sum form.  tests/test_golden_parity.py pins seeds and asserts the
TPU ops reproduce these numbers (BASELINE.md north star: allclose vs the
reference path).
"""
from __future__ import annotations

import math

import numpy as np

SQRT3 = math.sqrt(3.0)


def calc_dt(t, exp_step_factor, max_samples, grid_size, scale):
    """raymarching.cu:11-13."""
    return float(np.clip(t * exp_step_factor, SQRT3 / max_samples,
                         SQRT3 * 2.0 * scale / grid_size))


def _mip_from_pos(xyz, cascades):
    """raymarching.cu:19-23."""
    mx = float(np.max(np.abs(xyz)))
    e = math.floor(math.log2(max(mx, 1e-10))) + 2
    return int(np.clip(e, 0, cascades - 1))


def _mip_from_dt(dt, grid_size, cascades):
    """raymarching.cu:28-32."""
    e = math.floor(math.log2(max(dt * grid_size, 1e-10))) + 1
    return int(np.clip(e, 0, cascades - 1))


def march_ray(o, d, t1, t2, occ_grid, *, cascades, scale, exp_step_factor,
              grid_size, max_samples, noise=0.0):
    """Sequential occupancy march of ONE ray (raymarching.cu:166-332).

    occ_grid: (C, G, G, G) truthy occupancy.  Returns the list of sample
    distances t (the reference also emits xyz/dir/dt per sample — all
    derived from t).  Steps the dt-chain; occupied cells emit a sample,
    empty cells advance to the cell's exit boundary staying ON the chain
    (raymarching.cu:225-233: `do t += calc_dt(t) while (t < t_target)`).
    """
    G = grid_size
    if t1 < 0:
        return []
    t = t1 + calc_dt(t1, exp_step_factor, max_samples, grid_size, scale) * noise
    ts = []
    while 0 <= t < t2 and len(ts) < max_samples:
        xyz = o + t * d
        dt = calc_dt(t, exp_step_factor, max_samples, grid_size, scale)
        if cascades == 1:
            mip, mip_bound = 0, scale
        else:
            mip = max(_mip_from_pos(xyz, cascades),
                      _mip_from_dt(dt, grid_size, cascades))
            mip_bound = min(2.0 ** (mip - 1), scale)
        u = (xyz / mip_bound + 1.0) * 0.5 * G
        n = np.clip(u, 0.0, G - 1.0).astype(np.int64)
        if occ_grid[mip, n[0], n[1], n[2]]:
            ts.append(t)
            t += dt
        else:
            # DDA advance: distance to the current cell's exit face per axis
            # (the +0.5 +0.5*sign(d) form of the instant-ngp skip)
            cell_exit = ((n + 0.5 + 0.5 * np.sign(d)) / G * 2.0 - 1.0) \
                * mip_bound
            with np.errstate(divide="ignore"):
                tx = (cell_exit - xyz) / d
            t_target = t + max(0.0, float(np.min(tx)))
            while t < t_target:
                t += calc_dt(t, exp_step_factor, max_samples, grid_size,
                             scale)
    return ts


def composite_ray_fw(sigmas, rgbs, deltas, ts, T_threshold):
    """Sequential front-to-back compositing of ONE ray
    (volumerendering.cu:6-84).  Returns (opacity, depth, rgb, ws, n_eff)."""
    T = 1.0
    opacity = depth = 0.0
    rgb = np.zeros(3)
    ws = np.zeros(len(sigmas))
    n_eff = 0
    for s in range(len(sigmas)):
        if T <= T_threshold:
            break
        a = 1.0 - math.exp(-sigmas[s] * deltas[s])
        w = a * T
        rgb = rgb + w * rgbs[s]
        depth += w * ts[s]
        opacity += w
        ws[s] = w
        T *= 1.0 - a
        n_eff += 1
    return opacity, depth, rgb, ws, n_eff


def composite_ray_bw(sigmas, rgbs, deltas, ts, T_threshold,
                     dL_dopacity, dL_ddepth, dL_drgb, dL_dws=None):
    """Analytic backward of composite_ray_fw (volumerendering.cu:87-202),
    via explicit per-sample suffix sums.

    For L = sum_s g_s . w_s (g_s collects the rgb/depth/opacity/ws
    cotangents), with w_s = a_s T_s and T_s = prod_{j<s}(1 - a_j):

        dw_s/dsigma_s = delta_s (T_s - w_s)
        dw_j/dsigma_s = -delta_s w_j              for j > s

    Samples at/after the early break never execute, so their grads are 0.
    Returns (dL_dsigmas, dL_drgbs)."""
    n = len(sigmas)
    _, _, _, ws, n_eff = composite_ray_fw(sigmas, rgbs, deltas, ts,
                                          T_threshold)
    if dL_dws is None:
        dL_dws = np.zeros(n)
    # per-sample scalar coefficient g_s = dL/dw_s
    g = np.zeros(n)
    for s in range(n_eff):
        g[s] = (dL_dopacity + dL_ddepth * ts[s]
                + float(np.dot(dL_drgb, rgbs[s])) + dL_dws[s])
    # T_s recomputed sequentially
    d_sigma = np.zeros(n)
    d_rgb = np.zeros((n, 3))
    T = 1.0
    for s in range(n_eff):
        a = 1.0 - math.exp(-sigmas[s] * deltas[s])
        w = a * T
        suffix = 0.0
        for j in range(s + 1, n_eff):
            suffix += g[j] * ws[j]
        d_sigma[s] = deltas[s] * (g[s] * (T - w) - suffix)
        d_rgb[s] = dL_drgb * w
        T *= 1.0 - a
    return d_sigma, d_rgb


def distortion_ray(ws, deltas, ts):
    """O(n^2) pairwise mip-NeRF-360 distortion loss of ONE ray
    (the definition losses.cu:9-109 computes via prefix sums):

        L = sum_i sum_j w_i w_j |t_i - t_j| + 1/3 sum_i w_i^2 delta_i
    """
    n = len(ws)
    L = 0.0
    for i in range(n):
        for j in range(n):
            L += ws[i] * ws[j] * abs(ts[i] - ts[j])
        L += ws[i] * ws[i] * deltas[i] / 3.0
    return L


def distortion_ray_bw(ws, deltas, ts):
    """dL/dw_s of distortion_ray by direct differentiation of the O(n^2)
    form (losses.cu:112-175)."""
    n = len(ws)
    d_w = np.zeros(n)
    for s in range(n):
        acc = 0.0
        for j in range(n):
            acc += 2.0 * ws[j] * abs(ts[s] - ts[j])
        d_w[s] = acc + 2.0 * ws[s] * deltas[s] / 3.0
    return d_w
