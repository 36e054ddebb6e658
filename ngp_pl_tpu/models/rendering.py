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
from ngp_pl_tpu.ops.ray_march import (
    calc_dt,
    march_rays_test_round,
    march_rays_train,
    march_rays_train_segments,
    march_rays_train_strided,
    march_rays_train_window,
)
from ngp_pl_tpu.ops.volume_render import (
    composite_test_round,
    composite_train,
    composite_train_strided,
)


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
    n_samples: Optional[int] = None,          # per-ray budget S (strided)
    chain_length: int = 0,                    # override the dt-chain bound
    occ_rows: Optional[jnp.ndarray] = None,   # precomputed packed z-lines
    win_rows: Optional[jnp.ndarray] = None,   # precomputed 8^3 windows
) -> Dict[str, jnp.ndarray]:
    """Differentiable train-time render, strided layout
    (reference rendering.py:121-163).

    Ray r owns row r of every (N, S) tensor — march, field, compositing and
    losses are all lane-axis math with no CSR segment machinery (see
    StridedMarch).  Gradients flow to params and to rays_o/rays_d (sample
    positions are recomputed as o + t*d with t stopped, which reproduces the
    reference RayMarcher backward's segment-sum ray gradients for free,
    custom_functions.py:102-112).
    """
    cfg = ngp.cfg
    N = rays_o.shape[0]
    S = n_samples or rcfg.train_pool_mult
    hits_t = scene_hits(rays_o, rays_d, cfg.scale)
    chain = chain_length or (
        rcfg.max_samples if cfg.exp_step_factor == 0
        else 2 * rcfg.max_samples)

    m = march_rays_train_strided(
        jax.lax.stop_gradient(rays_o),
        jax.lax.stop_gradient(rays_d),
        jax.lax.stop_gradient(hits_t),
        noise,
        occ_grid,
        cascades=cfg.cascades,
        scale=cfg.scale,
        exp_step_factor=cfg.exp_step_factor,
        grid_size=cfg.grid_size,
        max_samples=rcfg.max_samples,
        n_samples=S,
        chain_length=chain,
        occ_rows=occ_rows,
        win_rows=win_rows,
    )

    # materialize the march outputs: without the barrier XLA fuses the whole
    # (N, K) candidate chain into each (N, S)-consumer, re-running it per
    # consumer op (measured 10x step blowup on CPU; wasted VPU work on TPU)
    m = m._replace(**dict(zip(
        ("ts", "deltas", "valid"),
        jax.lax.optimization_barrier((m.ts, m.deltas, m.valid)))))
    xyz = rays_o[:, None, :] + m.ts[..., None] * rays_d[:, None, :]  # (N,S,3)
    sigmas, rgbs = ngp.forward_rays(params, xyz, rays_d, exposure=exposure)

    out = composite_train_strided(
        sigmas, rgbs, m.deltas, m.ts, m.valid,
        T_threshold=rcfg.t_threshold,
    )
    out["rgb"] = out["rgb"] + bg_rgb[None, :] * (1.0 - out["opacity"][:, None])
    # all-or-nothing supervision: a ray whose occupied count exceeds S is
    # front-truncated by the march — training on its partial render biases
    # toward the covered entry slab (measured -5 dB, see RESULTS.md); drop
    # such rays from the loss entirely (a zero-grad no-op, like CSR pool
    # drops at saturation).  S tracks the q99 demand so this is ~1% of rays.
    out["loss_mask"] = m.rm_counts <= S
    out["deltas"] = m.deltas
    out["ts"] = m.ts
    out["valid"] = m.valid
    out["rm_samples"] = m.total
    out["rm_counts"] = m.rm_counts
    out["chain_demand"] = m.chain_demand
    out["chain_demand_q"] = m.chain_demand_q
    out["vr_counts"] = out["vr_samples"]          # (N,) effective samples
    out["vr_samples"] = out["vr_samples"].sum()
    return out


def render_rays_train_csr(
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
    n_intervals: int = 0,                     # >0: two-level segment march
    occ_rows: Optional[jnp.ndarray] = None,   # precomputed packed z-lines
    dil_rows: Optional[jnp.ndarray] = None,   # precomputed dilated z-lines
    win_rows: Optional[jnp.ndarray] = None,   # precomputed 8^3 windows
) -> Dict[str, jnp.ndarray]:
    """CSR-pool train render (the round-1 layout; superseded by the strided
    `render_rays_train` but kept for comparison tests and as the fallback
    for workloads with strongly skewed per-ray sample counts, where CSR
    packing wastes less field work than a per-ray budget).
    (reference rendering.py:121-163).

    Gradients flow to params and to rays_o/rays_d (sample positions are
    recomputed as o + t*d with t stopped, which reproduces the reference
    RayMarcher backward's segment-sum ray gradients for free,
    custom_functions.py:102-112).
    """
    cfg = ngp.cfg
    N = rays_o.shape[0]
    hits_t = scene_hits(rays_o, rays_d, cfg.scale)
    pool_size = N * (pool_mult or rcfg.train_pool_mult)

    chain = chain_length or (
        rcfg.max_samples if cfg.exp_step_factor == 0
        else 2 * rcfg.max_samples)
    if (win_rows is not None and cfg.cascades == 1
            and cfg.exp_step_factor == 0.0):
        # windowed march: one 64B occupancy gather per 8 chain steps, exact
        # bits, no interval budget (callers verify segment_march_dmax_ok)
        m = march_rays_train_window(
            jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d),
            jax.lax.stop_gradient(hits_t),
            noise,
            win_rows,
            scale=cfg.scale,
            grid_size=cfg.grid_size,
            max_samples=rcfg.max_samples,
            pool_size=pool_size,
            chain_length=chain,
        )
    elif n_intervals > 0 and cfg.cascades == 1 and cfg.exp_step_factor == 0.0:
        m = march_rays_train_segments(
            jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d),
            jax.lax.stop_gradient(hits_t),
            occ_grid,
            noise,
            scale=cfg.scale,
            grid_size=cfg.grid_size,
            max_samples=rcfg.max_samples,
            pool_size=pool_size,
            chain_length=chain,
            n_intervals=n_intervals,
            occ_rows=occ_rows,
            dil_rows=dil_rows,
        )
    else:
        # multi-cascade / exp-stepping: march_rays_train uses the 2-gather
        # windowed chain (_occ_window_chain_mc) when win_rows is provided
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
            chain_length=chain,
            occ_rows=occ_rows,
            win_rows=win_rows,
        )

    ridx = jnp.clip(m.ray_idx, 0, N - 1)
    # ONE 32-byte-row gather of [o | d | exposure] per sample instead of 2-3
    # narrow (P, 3) gathers — gather cost on TPU is per ROW, so merging the
    # per-ray payloads halves this stage's random-access count
    ncol = 7 if exposure is not None else 6
    od = jnp.concatenate(
        [rays_o, rays_d] + ([exposure] if exposure is not None else []),
        axis=1)
    od = jnp.pad(od, ((0, 0), (0, 8 - ncol)))[ridx]          # (P, 8)
    xyz = od[:, 0:3] + m.ts[:, None] * od[:, 3:6]
    dirs = od[:, 3:6]
    sample_exposure = od[:, 6:7] if exposure is not None else None
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
    out["chain_demand"] = m.chain_demand
    out["chain_demand_q"] = m.chain_demand_q
    out["vr_counts"] = out["vr_samples"]          # (N,) effective samples
    out["vr_samples"] = out["vr_samples"].sum()
    return out


def render_rays_train_rounds(
    ngp: NGP,
    params,
    occ_grid: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise: jnp.ndarray,
    bg_rgb: jnp.ndarray,
    *,
    rcfg: RenderConfig,
    exposure: Optional[jnp.ndarray] = None,
    n_samples: int = 16,            # S: samples per ray per round
    chain_length: int = 256,        # chain steps examined per round
    n_rounds: int = 4,              # unrolled rounds (static)
    lambda_distortion: float = 0.0,
    occ_rows: Optional[jnp.ndarray] = None,
    win_rows: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Multi-round differentiable train render — the TPU answer to heavy-
    tailed per-ray sample demand.

    One-shot layouts must budget for a per-ray worst case: strided (N, S)
    charges every ray the tail price, the CSR pool pays the mean but
    evaluates ALL occupied samples (rm) even though samples behind the
    T<1e-4 horizon carry zero gradient.  This path instead marches in
    `n_rounds` unrolled rounds of S occupied samples each with a carried
    per-ray transmittance (the structure of the reference's inference loop,
    rendering.py:75-105, made differentiable): rays that converge (T below
    threshold), exit the scene, or exhaust the chain drop out, and the
    remaining alive rays are compacted to the front of a half-sized slot
    array between rounds (prefix-sum compaction, shapes static).  Cost is
    therefore ~ the EFFECTIVE sample count (vr) — 2-3x below rm on
    converged scenes — while deep tail rays still receive up to
    n_rounds * S front-to-back samples.  Alive rays beyond a round's slot
    capacity are dropped like the CSR pool drops at saturation (an unbiased
    no-op subsample: zero-sample rays have zero parameter gradient).

    Gradients flow to params (and rays via recomputed positions) through
    every round; the mip-NeRF-360 distortion loss accumulates per round
    from carried prefix sums (losses.cu:7 DVGO form needs only the
    running ws/ws*t prefixes and the global accumulated opacity).
    """
    cfg = ngp.cfg
    N = rays_o.shape[0]
    S = n_samples
    hits_t = scene_hits(rays_o, rays_d, cfg.scale)
    t_end = hits_t[:, 1]

    # per-ray carried state (start jitter: reference raymarching.cu:195-198)
    t1 = hits_t[:, 0]
    t_cur = jnp.where(
        t1 >= 0,
        t1 + noise * calc_dt(t1, cfg.exp_step_factor, rcfg.max_samples,
                             cfg.grid_size, cfg.scale),
        t_end)
    T = jnp.ones((N,), jnp.float32)
    rgb = jnp.zeros((N, 3), jnp.float32)
    depth = jnp.zeros((N,), jnp.float32)
    opacity = jnp.zeros((N,), jnp.float32)
    dist = jnp.zeros((N,), jnp.float32)
    ws_in = jnp.zeros((N,), jnp.float32)     # running sum of w
    wts_in = jnp.zeros((N,), jnp.float32)    # running sum of w * t
    alive = hits_t[:, 0] >= 0
    vr_counts = jnp.zeros((N,), jnp.int32)
    rm_counts = jnp.zeros((N,), jnp.int32)
    # rays that outlive a round's slot capacity are DROPPED FROM THE LOSS
    # entirely (loss_mask): partially-supervised rays bias training toward
    # their covered prefix (measured -4.4 dB), while zero-contribution rays
    # are exact no-ops — the same all-or-nothing rule as CSR pool drops
    dropped = jnp.zeros((N,), bool)
    total_slots = 0

    for r in range(n_rounds):
        slots = max(256, N >> r)
        total_slots += slots
        # compact alive ray ids to the front (sentinel N beyond)
        alive_i = alive.astype(jnp.int32)
        pos = jnp.cumsum(alive_i) - alive_i
        idx_full = jnp.full((N,), N, jnp.int32).at[
            jnp.where(alive, pos, N)].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        raw = idx_full[:slots]
        # gathers clamp the sentinel (values are masked by sel); scatters
        # below use the UNCLAMPED raw with mode="drop" — a clamped pad slot
        # would collide with ray N-1's real write (duplicate scatter
        # indices, backend-dependent winner)
        idx = jnp.minimum(raw, N - 1)
        sel = (raw < N)
        dropped = dropped | (alive & (pos >= slots))

        ro, rd = rays_o[idx], rays_d[idx]
        ts, dts, valid, t_next, n_eff = march_rays_test_round(
            jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd),
            jax.lax.stop_gradient(t_cur[idx]),
            jax.lax.stop_gradient(t_end[idx]),
            occ_grid, cascades=cfg.cascades, scale=cfg.scale,
            exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
            max_samples=rcfg.max_samples, n_samples=S,
            chain_length=chain_length, occ_rows=occ_rows,
            win_rows=win_rows)   # test-round march gates uniform/mc use
        valid = valid & sel[:, None]
        (ts, dts, valid) = jax.lax.optimization_barrier((ts, dts, valid))

        xyz = ro[:, None, :] + ts[..., None] * rd[:, None, :]
        sigmas, rgbs_t = ngp.forward_rays(
            params, xyz, rd,
            exposure=exposure[idx] if exposure is not None else None)

        # differentiable incremental compositing (lane-axis over S)
        from ngp_pl_tpu.ops.volume_render import SD_CLAMP

        sd = jnp.where(valid, jnp.minimum(sigmas * dts, SD_CLAMP), 0.0)
        excl = jnp.cumsum(sd, axis=1) - sd
        T0 = T[idx]
        T_s = T0[:, None] * jnp.exp(-excl)
        alpha = 1.0 - jnp.exp(-sd)
        keep = T_s > rcfg.t_threshold
        w = jnp.where(valid & keep, alpha * T_s, 0.0)

        if lambda_distortion > 0:
            # DVGO prefix-sum distortion with cross-round carries
            wt = w * ts
            ws_ex_r = jnp.cumsum(w, axis=1) - w + ws_in[idx][:, None]
            wts_ex_r = jnp.cumsum(wt, axis=1) - wt + wts_in[idx][:, None]
            per_s = (2.0 * ((wts_ex_r + wt) * ws_ex_r
                            - (ws_ex_r + w) * wts_ex_r)
                     + (w * w * dts) / 3.0)
            dist = dist.at[raw].add(per_s.sum(axis=1), mode="drop")
            ws_in = ws_in.at[raw].add(w.sum(axis=1), mode="drop")
            wts_in = wts_in.at[raw].add(wt.sum(axis=1), mode="drop")

        d_rgb = jnp.einsum("ns,cns->nc", w, rgbs_t)
        d_dep = (w * ts).sum(axis=1)
        d_opa = w.sum(axis=1)
        T_new = T0 * jnp.exp(-sd.sum(axis=1))

        def upd(full, delta):
            return full.at[raw].add(delta, mode="drop")

        rgb = upd(rgb, d_rgb)
        depth = upd(depth, d_dep)
        opacity = upd(opacity, d_opa)
        T = T.at[raw].set(T_new, mode="drop")
        t_cur = t_cur.at[raw].set(t_next, mode="drop")
        vr_counts = vr_counts.at[raw].add((valid & keep).sum(axis=1),
                                          mode="drop")
        rm_counts = rm_counts.at[raw].add(n_eff, mode="drop")
        still = (sel & (T_new > rcfg.t_threshold)
                 & (t_next < t_end[idx]))
        alive = jnp.zeros((N,), bool).at[raw].set(still, mode="drop")

    # rays still alive after the last round are also truncated mid-depth
    loss_mask = ~(dropped | alive)
    out = {
        "rgb": rgb + bg_rgb[None, :] * (1.0 - opacity[:, None]),
        "depth": depth,
        "opacity": opacity,
        "distortion": dist,
        "loss_mask": loss_mask,
        "rm_samples": rm_counts.sum(),
        "rm_counts": rm_counts,
        "vr_counts": vr_counts,
        "vr_samples": vr_counts.sum(),
        # residual alive rays wanted more rounds/budget; report like the
        # one-shot marchers so the budget feedback keeps working
        "chain_demand": jnp.asarray(chain_length * n_rounds, jnp.int32),
        "chain_demand_q": jnp.asarray(chain_length, jnp.int32),
        "rounds_alive_end": alive.sum(),
        "total_slots": jnp.asarray(total_slots, jnp.int32),
    }
    return out


def make_test_renderer(ngp: NGP, rcfg: RenderConfig, chunk: int = 16384,
                       pool_mult: int = 64, use_window: bool = False,
                       chain_length: int = 0,
                       t_threshold: Optional[float] = None):
    """Build a no-grad chunked whole-image renderer (reference
    rendering.py:31-36 test path + test.ipynb usage).

    One full-chain march + one CSR field pass per chunk: pays the occupied
    count (rm) with NO per-round scheduling overhead.  On scenes whose
    sample mass sits in fringe-grazing rays that never cross the early-out
    threshold (vr ~= rm, e.g. the procedural bench scene), this beats the
    adaptive round renderer, whose rounds re-pay march/compaction per
    round; on hard-surface scenes the round renderer's early termination
    wins.  use_window enables the 64B-window occupancy march (single
    cascade, uniform stepping, `segment_march_dmax_ok` holds)."""
    cfg = ngp.cfg
    thr = rcfg.test_t_threshold if t_threshold is None else t_threshold
    from ngp_pl_tpu.ops.ray_march import occupancy_windows

    window = use_window and cfg.cascades == 1 and cfg.exp_step_factor == 0.0

    @jax.jit
    def _render_chunk(params, occ_grid, rays_o, rays_d):
        N = rays_o.shape[0]
        hits_t = scene_hits(rays_o, rays_d, cfg.scale)
        chain = chain_length or (
            rcfg.max_samples if cfg.exp_step_factor == 0
            else 2 * rcfg.max_samples)
        if window:
            m = march_rays_train_window(
                rays_o, rays_d, hits_t,
                jnp.zeros((N,), rays_o.dtype),
                occupancy_windows(occ_grid),
                scale=cfg.scale,
                grid_size=cfg.grid_size,
                max_samples=rcfg.max_samples,
                pool_size=N * pool_mult,
                chain_length=chain,
            )
        else:
            m = march_rays_train(
                rays_o, rays_d, hits_t, occ_grid,
                jnp.zeros((N,), rays_o.dtype),  # no start jitter at test
                cascades=cfg.cascades,
                scale=cfg.scale,
                exp_step_factor=cfg.exp_step_factor,
                grid_size=cfg.grid_size,
                max_samples=rcfg.max_samples,
                pool_size=N * pool_mult,
                chain_length=chain,
            )
        ridx = jnp.clip(m.ray_idx, 0, N - 1)
        od = jnp.pad(jnp.concatenate([rays_o, rays_d], axis=1),
                     ((0, 0), (0, 2)))[ridx]                 # (P, 8)
        xyz = od[:, 0:3] + m.ts[:, None] * od[:, 3:6]
        sigmas, rgbs = ngp.forward(params, xyz, od[:, 3:6])
        out = composite_train(
            sigmas, rgbs, m.deltas, m.ts, m.ray_idx, m.valid, m.offsets,
            n_rays=N, T_threshold=thr,
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


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def make_device_round_renderer(ngp: NGP, rcfg: RenderConfig,
                               chunk: int = 131072, max_rounds: int = 512,
                               use_window: bool = False,
                               t_threshold: Optional[float] = None,
                               mesh=None, mesh_axis: str = "data",
                               buckets=None,
                               debug_const_field: bool = False,
                               span_super_factor: int = 4):
    """Device-resident adaptive renderer (reference rendering.py:46-118,
    re-designed for a high-latency host link).

    The reference's alive-ray loop returns to the host every round to
    recompute `N_samples = clamp(N_rays // N_alive, min, 64)` and compact
    the alive list; behind a remote tunnel each of those syncs costs more
    than the round's compute.  Here the WHOLE loop is one XLA program: a
    `lax.while_loop` whose body compacts alive ray ids to the front with a
    prefix sum and `lax.switch`es between (slot, n_samples) BUCKETS chosen
    from the on-device alive count — the static-shape counterpart of the
    reference's adaptive round sizing.  Slot count shrinks / samples-per-ray
    grows as rays converge, keeping useful work per round roughly constant
    instead of evaluating a mostly-dead fixed slot array.  The host sees
    exactly one dispatch per chunk.

    mesh: optional jax.sharding.Mesh with a `mesh_axis` axis — chunk rays
    are sharded across it and params/grid replicated, so test rendering
    uses every chip (the DP split the reference gets from DDP validation,
    train.py:225-237); GSPMD inserts the collectives for the global
    alive-compaction/bucket choice.
    """
    cfg = ngp.cfg
    from ngp_pl_tpu.ops.ray_march import (
        occupancy_lines,
        occupancy_windows,
        occupied_span,
        occupied_span_prep,
    )

    ray_sharding = repl_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_sharding = NamedSharding(mesh, P(mesh_axis))
        repl_sharding = NamedSharding(mesh, P())
    # callers gate eligibility (segment_march_dmax_ok for single-cascade
    # uniform stepping, window_march_mc_ok for multi-cascade/exp) — the
    # march itself picks the uniform 8-step or the 2-gather mc window chain
    window = use_window
    thr = rcfg.test_t_threshold if t_threshold is None else t_threshold
    min_s = 1 if cfg.exp_step_factor == 0 else 4
    # (slots, n_samples, chain) buckets, largest first.  The biggest bucket
    # gets a LONG chain so empty-space traversal (camera to first surface)
    # completes in ~1-2 rounds instead of burning a full field eval every 64
    # steps of advance; window gathers make long chains cheap.
    # first bucket honors min_s (reference rendering.py:80: N_samples =
    # clamp(N_rays // N_alive, min_samples, 64) == min_samples while most
    # rays are alive); later buckets grow 4x as the alive set shrinks
    if buckets is None:
        # 2x slot ladder, S starting at 8: measured 1.7x faster frames than
        # the original 4x/S=4 ladder (benchmarking/tune_fps.py: 4.4 vs 7.4 s
        # at 800^2) — 4x slot steps waste up to 75% of a round's slots on
        # dead rays, and S=4 re-pays the round's fixed march/compaction cost
        # too often for surface rays
        buckets = []
        s, ns = chunk, max(min_s, 8)
        first = True
        while s >= 1024 and ns <= 64:
            buckets.append((s, ns, 256 if first else 128))
            s //= 2
            ns = min(64, ns * 2)
            first = False
        tail = (min(max(s, 256), chunk), 64, 128)
        if tail not in buckets:
            buckets.append(tail)

    use_span = cfg.cascades == 1 and cfg.exp_step_factor == 0.0

    # Per-grid packed-occupancy cache: the window/z-line rows (~94 ms to
    # rebuild on-chip) and the span super-grid (~20 ms) depend only on
    # occ_grid — computing them inside the chunk renderer used to pay both
    # PER CHUNK (8+ chunks/frame at 800^2).  The entry pins the grid array
    # so identity can't be recycled; eval renders (grid frozen) hit the
    # cache for every chunk of every frame.
    _grid_cache: list = []
    _pack_rows = jax.jit(
        lambda g: occupancy_windows(g) if window else occupancy_lines(g))
    # span_super_factor: 2 (64^3 super-grid) was A/B'd at 800^2 and LOST
    # to 4 (0.35 vs 0.39 FPS) — the doubled span-pass gathers cost more
    # than the tighter cull saved on this scene's dilated thin shells
    _prep_span = jax.jit(
        lambda g: occupied_span_prep(g, grid_size=cfg.grid_size,
                                     super_factor=span_super_factor))

    def _packed(occ_grid):
        if _grid_cache and _grid_cache[0] is occ_grid:
            return _grid_cache[1], _grid_cache[2]
        rows = _pack_rows(occ_grid)
        sl = _prep_span(occ_grid) if use_span else None
        _grid_cache[:] = [occ_grid, rows, sl]
        return rows, sl

    @jax.jit
    def _span_pass(span_lines, rays_o, rays_d):
        """Whole-frame occupied-span pre-pass (~114 gathers/ray from a 4 KB
        dilated super-grid).  Rays with an empty span are culled before ANY
        round; survivors get tight [t_start, t_end) bounds at their
        occupied region.  The reference's per-thread DDA gets this
        implicitly (raymarching.cu:225-233 skips empty cells in-kernel);
        round-structured marching would otherwise pay the empty space per
        ROUND."""
        hits = scene_hits(rays_o, rays_d, cfg.scale)
        t1s, t2s, span_steps = occupied_span(
            rays_o, rays_d, hits[:, 0], hits[:, 1], None,
            scale=cfg.scale, grid_size=cfg.grid_size,
            dt_min=float(SQRT3) / rcfg.max_samples, span_lines=span_lines,
            super_factor=span_super_factor)
        alive = (hits[:, 0] >= 0) & (span_steps > 0)
        return t1s, t2s, alive

    @jax.jit
    def _render_fused(params, rows, span_lines, rays_o, rays_d):
        """Single-dispatch frame: span + cull + the whole round loop as ONE
        XLA program.  For frames that fit one chunk (GUI preview, small
        eval) this cuts the per-frame remote round trips from ~6 to 2."""
        t1s, t2s, alive = _span_pass(span_lines, rays_o, rays_d)
        t_start = jnp.where(alive, t1s, -1.0)
        return _render_chunk(params, rows, rays_o, rays_d, t_start, t2s)

    @jax.jit
    def _render_chunk(params, rows, rays_o, rays_d,
                      t_start=None, t_end=None):
        N = rays_o.shape[0]
        occ_rows = None if window else rows
        win_rows = rows if window else None

        if t_start is None:
            hits = scene_hits(rays_o, rays_d, cfg.scale)
            t_start = hits[:, 0]
            t_end = hits[:, 1]
        alive0 = t_start >= 0

        init = dict(
            t_cur=t_start,
            opacity=jnp.zeros((N,), jnp.float32),
            depth=jnp.zeros((N,), jnp.float32),
            rgb=jnp.zeros((N, 3), jnp.float32),
            alive=alive0,
            samples=jnp.zeros((N,), jnp.int32),
            total=jnp.zeros((), jnp.int32),
            rounds=jnp.zeros((), jnp.int32),
        )

        def cond(c):
            return c["alive"].any() & (c["rounds"] < max_rounds)

        def make_round(slots, n_s, chain):
            chain = -(-max(chain, 4 * n_s) // 8) * 8

            def round_fn(c, idx_full):
                raw = idx_full[:slots]                           # (S,)
                # tail slots (beyond the alive count) carry sentinel N
                idx = jnp.minimum(raw, N - 1)
                sel_alive = c["alive"][idx] & (raw < N)
                ro, rd = rays_o[idx], rays_d[idx]
                te = t_end[idx]
                ts, dts, valid, t_next, n_eff = march_rays_test_round(
                    ro, rd, c["t_cur"][idx], te, None,
                    cascades=cfg.cascades, scale=cfg.scale,
                    exp_step_factor=cfg.exp_step_factor,
                    grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
                    n_samples=n_s, chain_length=chain, occ_rows=occ_rows,
                    win_rows=win_rows)
                S = slots
                if debug_const_field:
                    # cost-isolation mode (benchmarking only): march +
                    # scheduling + composite without the field eval
                    sigmas = jnp.full((S, n_s), 10.0)
                    rgbs = jnp.full((S, n_s, 3), 0.5)
                else:
                    xyz = ro[:, None, :] + ts[..., None] * rd[:, None, :]
                    dirs = jnp.broadcast_to(rd[:, None, :], (S, n_s, 3))
                    sigmas, rgbs = ngp.forward(
                        params, xyz.reshape(S * n_s, 3),
                        dirs.reshape(S * n_s, 3))
                    sigmas = sigmas.reshape(S, n_s)
                    rgbs = rgbs.reshape(S, n_s, 3)
                o2, d2, r2, a2 = composite_test_round(
                    sigmas, rgbs, dts, ts, valid,
                    c["opacity"][idx], c["depth"][idx], c["rgb"][idx],
                    sel_alive, thr)
                a2 = a2 & (t_next < te)
                s2 = c["samples"][idx] + jnp.where(sel_alive, n_s, 0)
                a2 = a2 & (s2 < rcfg.max_samples)

                def upd(old_sel, new, old_full):
                    # scatter with the unclamped sentinel + drop: a clamped
                    # pad slot would duplicate ray N-1's index and could
                    # overwrite its real update with stale values
                    keep = sel_alive if new.ndim == 1 else sel_alive[:, None]
                    return old_full.at[raw].set(
                        jnp.where(keep, new, old_sel), mode="drop")

                return dict(
                    t_cur=upd(c["t_cur"][idx], t_next, c["t_cur"]),
                    opacity=upd(c["opacity"][idx], o2, c["opacity"]),
                    depth=upd(c["depth"][idx], d2, c["depth"]),
                    rgb=upd(c["rgb"][idx], r2, c["rgb"]),
                    alive=upd(c["alive"][idx], a2, c["alive"]),
                    samples=upd(c["samples"][idx], s2, c["samples"]),
                    total=c["total"]
                    + jnp.where(sel_alive, n_eff, 0).sum().astype(jnp.int32),
                    rounds=c["rounds"] + 1,
                )

            return round_fn

        round_fns = [make_round(s, ns, ch) for s, ns, ch in buckets]
        slot_sizes = jnp.asarray([s for s, _, _ in buckets], jnp.int32)

        def body(c):
            alive_i = c["alive"].astype(jnp.int32)
            n_alive = alive_i.sum()
            # stable prefix-sum compaction of alive ray ids to the front;
            # unwritten tail slots keep the sentinel N (masked in round_fn)
            pos = jnp.cumsum(alive_i) - alive_i
            idx_full = jnp.full((N,), N, jnp.int32).at[
                jnp.where(c["alive"], pos, N)].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop")
            # smallest bucket that still fits every alive ray
            branch = jnp.sum(
                (slot_sizes[1:] >= n_alive).astype(jnp.int32))
            return jax.lax.switch(
                branch, [lambda c, i, f=f: f(c, i) for f in round_fns],
                c, idx_full)

        final = jax.lax.while_loop(cond, body, init)
        return (final["rgb"], final["depth"], final["opacity"],
                final["total"], final["rounds"])

    @jax.jit
    def _gather_chunk(rays_o, rays_d, t1_all, t2_all, sel, real_mask):
        """Device-side gather of a compacted chunk (sel int32 (chunk,),
        pads index 0 and are killed via real_mask -> t_start = -1)."""
        ro = rays_o[sel]
        rd = rays_d[sel]
        ts = jnp.where(real_mask, t1_all[sel], -1.0)
        te = jnp.where(real_mask, t2_all[sel], -1.0)
        return ro, rd, ts, te

    def render_image(params, occ_grid, rays_o, rays_d, bg_color=None):
        """rays may be host numpy OR device jnp arrays (one upload at most;
        all slicing/gathering below stays on device — the remote-tunnel
        h2d path costs ~13 ms/MB, so a frame must not round-trip its rays)."""
        if bg_color is None:
            bg_color = 1.0 if cfg.exp_step_factor == 0 else 0.0
        N = rays_o.shape[0]
        if ray_sharding is not None:
            params = jax.device_put(params, repl_sharding)
            occ_grid = jax.device_put(occ_grid, repl_sharding)

        def put(a):
            return (jax.device_put(a, ray_sharding)
                    if ray_sharding is not None else a)

        rows, span_lines = _packed(occ_grid)
        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)

        if use_span and N <= chunk:
            # single-chunk frame (GUI preview / small eval): ONE fused
            # dispatch — span, cull, and round loop in one XLA program
            ro, rd = rays_o, rays_d
            pad = chunk - N
            if pad:
                ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            r, d, o, ns, rnds = _render_fused(
                params, rows, span_lines, put(ro), put(rd))
            opacity = np.asarray(o[:N])
            rgb = (np.asarray(r[:N])
                   + np.asarray(bg_color) * (1.0 - opacity[:, None]))
            return {
                "rgb": rgb,
                "depth": np.asarray(d[:N]),
                "opacity": opacity,
                "total_samples": int(ns),
                "rounds": int(rnds),
            }

        if use_span:
            # frame-level span pass + alive compaction: round-loop launches
            # scale with rays that have occupied content, not frame area
            # (the reference's alive_indices analog, rendering.py:105).
            # Launch EVERYTHING before reading ANYTHING: through a remote
            # tunnel each blocking readback costs a full round trip, so the
            # per-chunk sync pattern alone was ~1.9 s/frame at 800^2
            pend = []
            for i in range(0, N, chunk):
                ro = rays_o[i:i + chunk]
                rd = rays_d[i:i + chunk]
                pad = chunk - ro.shape[0]
                if pad:
                    ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
                    rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
                t1s, t2s, alive = _span_pass(span_lines, put(ro), put(rd))
                n = min(chunk, N - i)
                pend.append((t1s[:n], t2s[:n], alive[:n]))
            t1_all = jnp.concatenate([p[0] for p in pend])  # device
            t2_all = jnp.concatenate([p[1] for p in pend])
            alive_all = np.concatenate([np.asarray(p[2]) for p in pend])
            idx = np.nonzero(alive_all)[0]

            rgb = np.zeros((N, 3), np.float32)
            depth = np.zeros((N,), np.float32)
            opacity = np.zeros((N,), np.float32)
            total = 0
            total_rounds = 0
            launched = []
            for i in range(0, len(idx), chunk):
                sel = idx[i:i + chunk]
                n = len(sel)
                sel_pad = np.zeros((chunk,), np.int32)
                sel_pad[:n] = sel
                mask = np.zeros((chunk,), bool)
                mask[:n] = True
                ro, rd, ts, te = _gather_chunk(
                    rays_o, rays_d, t1_all, t2_all,
                    jnp.asarray(sel_pad), jnp.asarray(mask))
                out = _render_chunk(
                    params, rows, put(ro), put(rd), put(ts), put(te))
                launched.append((sel, n, out))
            for sel, n, (r, d, o, ns, rnds) in launched:
                rgb[sel] = np.asarray(r[:n])
                depth[sel] = np.asarray(d[:n])
                opacity[sel] = np.asarray(o[:n])
                total += int(ns)
                total_rounds += int(rnds)
            rgb = rgb + np.asarray(bg_color) * (1.0 - opacity[:, None])
            return {
                "rgb": rgb,
                "depth": depth,
                "opacity": opacity,
                "total_samples": total,
                "rounds": total_rounds,
                "alive_rays": int(len(idx)),
            }

        rgbs, depths, opacities = [], [], []
        total = 0
        total_rounds = 0
        for i in range(0, N, chunk):
            ro = rays_o[i:i + chunk]
            rd = rays_d[i:i + chunk]
            pad = chunk - ro.shape[0]
            if pad:
                ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            rgb, depth, opa, ns, rnds = _render_chunk(params, rows,
                                                      put(ro), put(rd))
            n = min(chunk, N - i)
            rgbs.append(np.asarray(rgb[:n]))
            depths.append(np.asarray(depth[:n]))
            opacities.append(np.asarray(opa[:n]))
            total += int(ns)
            total_rounds += int(rnds)
        rgb = np.concatenate(rgbs)
        opacity = np.concatenate(opacities)
        rgb = rgb + np.asarray(bg_color) * (1.0 - opacity[:, None])
        return {
            "rgb": rgb,
            "depth": np.concatenate(depths),
            "opacity": opacity,
            "total_samples": total,
            "rounds": total_rounds,
        }

    # pose-based entry: directions upload once (cached by identity), only
    # the 3x4 pose crosses the link per frame; ray generation runs on
    # device (the GUI/eval per-frame h2d drops from ~7 MB to 48 bytes)
    _dirs_cache: list = []

    @jax.jit
    def _rays_from_pose(dirs_dev, pose_dev):
        rays_d = dirs_dev @ pose_dev[:, :3].T
        rays_o = jnp.broadcast_to(pose_dev[:, 3], rays_d.shape)
        return rays_o, rays_d

    def render_pose(params, occ_grid, directions, pose, bg_color=None):
        if not (_dirs_cache and _dirs_cache[0] is directions):
            _dirs_cache[:] = [directions,
                              jnp.asarray(np.asarray(directions),
                                          jnp.float32)]
        rays_o, rays_d = _rays_from_pose(
            _dirs_cache[1], jnp.asarray(np.asarray(pose, np.float32)))
        return render_image(params, occ_grid, rays_o, rays_d, bg_color)

    render_image.from_pose = render_pose
    return render_image


def make_round_renderer(ngp: NGP, rcfg: RenderConfig,
                        max_rounds: int = 64):
    """Adaptive alive-ray renderer (reference rendering.py:46-118).

    Host loop over marching rounds: alive rays are compacted (bucketed to
    powers of two so jit variants stay bounded), each round marches
    `n_samples = clamp(N_rays // N_alive, min_samples, 64)` occupied samples
    per alive ray, evaluates the field, composites incrementally, and kills
    converged rays.  Work per round stays ~O(N_rays) samples while marching
    advances, which is what gives the reference its inference FPS.
    """
    cfg = ngp.cfg
    min_samples = 1 if cfg.exp_step_factor == 0 else 4

    @partial(jax.jit, static_argnames=("n_s", "chain"))
    def _round(params, occ_grid, rays_o, rays_d, state_rows, *, n_s, chain):
        # state_rows: (B, 8) = [t_cursor, t_end, opacity, depth, r, g, b, pad]
        t_cur = state_rows[:, 0]
        t_end = state_rows[:, 1]
        opacity = state_rows[:, 2]
        depth = state_rows[:, 3]
        rgb = state_rows[:, 4:7]
        ts, dts, valid, t_next, n_eff = march_rays_test_round(
            rays_o, rays_d, t_cur, t_end, occ_grid,
            cascades=cfg.cascades, scale=cfg.scale,
            exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
            max_samples=rcfg.max_samples, n_samples=n_s, chain_length=chain)
        B, S = ts.shape
        xyz = (rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :])
        sigmas, rgbs = ngp.forward(params, xyz.reshape(B * S, 3),
                                   jnp.repeat(rays_d, S, axis=0))
        sigmas = sigmas.reshape(B, S)
        rgbs = rgbs.reshape(B, S, 3)
        alive = jnp.ones((B,), bool)
        opacity, depth, rgb, alive = composite_test_round(
            sigmas, rgbs, dts, ts, valid, opacity, depth, rgb, alive,
            rcfg.test_t_threshold)
        alive = alive & (t_next < t_end)
        new_rows = jnp.concatenate(
            [t_next[:, None], t_end[:, None], opacity[:, None],
             depth[:, None], rgb, jnp.zeros((B, 1))], axis=1)
        return new_rows, alive, n_eff.sum()

    def render_image(params, occ_grid, rays_o, rays_d, bg_color=None):
        if bg_color is None:
            bg_color = 1.0 if cfg.exp_step_factor == 0 else 0.0
        N = rays_o.shape[0]
        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)
        hits = scene_hits(rays_o, rays_d, cfg.scale)
        state = np.zeros((N, 8), np.float32)
        state[:, 0] = np.asarray(hits[:, 0])
        state[:, 1] = np.asarray(hits[:, 1])
        alive_idx = np.nonzero(state[:, 0] >= 0)[0]
        total_samples = 0
        samples_done = 0
        rounds = 0
        while len(alive_idx) and rounds < max_rounds \
                and samples_done < rcfg.max_samples:
            N_a = len(alive_idx)
            n_s = int(np.clip(N // N_a, min_samples, 64))
            # quantize to 4 variants (1/4/16/64) — each distinct (n_s, B)
            # pair is a separate XLA program; keep the set small
            n_s = max(min_samples,
                      [v for v in (1, 4, 16, 64) if v <= n_s][-1])
            chain = max(4 * n_s, 64)
            B = max(256, _next_pow2(N_a))
            idx = np.pad(alive_idx, (0, B - N_a), constant_values=alive_idx[0])
            ro = jnp.asarray(rays_o)[idx]
            rd = jnp.asarray(rays_d)[idx]
            rows = jnp.asarray(state[idx])
            new_rows, alive, ns = _round(params, occ_grid, ro, rd, rows,
                                         n_s=n_s, chain=chain)
            new_rows_np = np.asarray(new_rows[:N_a])
            state[alive_idx] = new_rows_np
            alive_np = np.asarray(alive[:N_a])
            alive_idx = alive_idx[alive_np]
            total_samples += int(ns)
            samples_done += n_s
            rounds += 1
        opacity = state[:, 2]
        rgb = state[:, 4:7] + np.asarray(bg_color) * (1 - opacity[:, None])
        return {
            "rgb": rgb,
            "depth": state[:, 3],
            "opacity": opacity,
            "total_samples": total_samples,
        }

    return render_image
