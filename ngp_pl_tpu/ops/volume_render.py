"""Differentiable front-to-back volume compositing over the flat sample pool.

Replaces `composite_train_fw` / `composite_train_bw`
(reference models/csrc/volumerendering.cu:6-202).  The CUDA version walks each
ray's samples sequentially accumulating transmittance with an early break at
T <= T_threshold; the backward re-walks the ray using the accumulated-color
suffix trick.  On TPU the same math is a segment-wise prefix scan:

    alpha_s = 1 - exp(-sigma_s * delta_s)
    T_s     = exp(-excl_cumsum_segment(sigma * delta))   (since 1-alpha = e^-sd)
    w_s     = alpha_s * T_s
    keep_s  = T_s > T_threshold        (early-stop as a mask, not a break)

One global cumsum over the pool plus a per-segment base subtraction implements
the segment scan with fixed shapes.  The whole graph is smooth jnp, so JAX
autodiff produces exactly the analytic backward the reference hand-writes
(volumerendering.cu:127-148) — verified against finite differences in
tests/test_volume_render.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


# Per-sample optical-depth ceiling.  alpha = 1 - exp(-25) rounds to exactly
# 1.0 in f32 and T after such a sample (< 1.4e-11) is below every
# threshold, so the clamp is semantically free — while bounding the global
# prefix sum the CSR compositor differences (below) to ~25 * pool_size.
# Root-caused r5 (benchmarking/nan_hunt_r5.log): late-training density
# runaway (expected NeRF MLE behavior on a memorized scene) produced
# finite sigma*delta ~ 1e10 per sample; the global cumsum then reached
# ~1e13 where f32 cancellation in (excl - seg_base) flipped local optical
# depths NEGATIVE by ~1e6 -> exp(+1e6) = inf -> NaN loss at step ~12.2k of
# every 30k run.  The clamp also ZEROES the d_sigma gradient of saturated
# samples — removing the unbounded-MLE driving force itself (the reference
# reaches the same endpoint through fp16 saturation + GradScaler skips).
SD_CLAMP = 25.0
# Segment optical depths are mathematically >= 0; clip defends the exp
# against any residual cancellation (T floor e^-88 ~ 6e-39, harmless).
_EXCL_MAX = 88.0


def segment_excl_cumsum(x: jnp.ndarray, offsets: jnp.ndarray,
                        ray_idx: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumsum within contiguous segments of a flat pool.

    x: (P,) values (must be 0 in invalid slots).
    offsets: (N_rays,) segment start slots.
    ray_idx: (P,) owning segment per slot (clamped for invalid slots).
    """
    c = jnp.cumsum(x)
    excl = c - x
    seg_base = excl[jnp.clip(offsets, 0, x.shape[0] - 1)]     # (N_rays,)
    ridx = jnp.clip(ray_idx, 0, offsets.shape[0] - 1)
    return jnp.clip(excl - seg_base[ridx], 0.0, _EXCL_MAX)


def composite_train(
    sigmas: jnp.ndarray,     # (P,)
    rgbs: jnp.ndarray,       # (P, 3)
    deltas: jnp.ndarray,     # (P,)
    ts: jnp.ndarray,         # (P,)
    ray_idx: jnp.ndarray,    # (P,) int32, == N_rays for unused slots
    valid: jnp.ndarray,      # (P,) bool
    offsets: jnp.ndarray,    # (N_rays,)
    n_rays: int,
    T_threshold: float = 1e-4,
) -> Dict[str, jnp.ndarray]:
    """Returns rgb/depth/opacity per ray + per-sample weights `ws` and the
    per-ray effective (post-early-stop) sample count `vr_samples`."""
    vmask = valid
    sd = jnp.where(vmask, jnp.minimum(sigmas * deltas, SD_CLAMP), 0.0)
    excl = segment_excl_cumsum(sd, offsets, ray_idx)
    T = jnp.exp(-excl)                                        # transmittance before s
    alpha = 1.0 - jnp.exp(-sd)
    keep = T > T_threshold                                    # reference break cond.
    w = jnp.where(vmask & keep, alpha * T, 0.0)

    seg = jnp.where(vmask, ray_idx, n_rays)
    # one 8-lane payload row per sample -> ONE segment scatter-add (scatter
    # cost on TPU is per input ROW, independent of row width)
    payload = jnp.stack(
        [w, w * ts, w * rgbs[:, 0], w * rgbs[:, 1], w * rgbs[:, 2],
         (vmask & keep).astype(jnp.float32), jnp.zeros_like(w),
         jnp.zeros_like(w)], axis=1)                          # (P, 8)
    sums = jax.ops.segment_sum(payload, seg, num_segments=n_rays + 1)[:-1]

    return {
        "opacity": sums[:, 0],
        "depth": sums[:, 1],
        "rgb": sums[:, 2:5],
        "ws": w,
        "vr_samples": sums[:, 5].astype(jnp.int32),
    }


def composite_train_strided(
    sigmas: jnp.ndarray,     # (N, S)
    rgb_t: jnp.ndarray,      # (3, N, S) — channel-major (see note)
    deltas: jnp.ndarray,     # (N, S)
    ts: jnp.ndarray,         # (N, S)
    valid: jnp.ndarray,      # (N, S) bool
    T_threshold: float = 1e-4,
) -> Dict[str, jnp.ndarray]:
    """Strided-layout train compositor (same math as composite_train,
    reference volumerendering.cu:6-84).

    With ray r owning row r, the segment scan degenerates to a LANE-axis
    cumsum over S and every per-ray reduction to a lane sum — no offsets, no
    segment scatter (the CSR form paid 3.7 ms of segment_sum + 1.4 ms of
    global cumsum at the bench shapes).  rgb arrives channel-major
    (3, N, S): a (P, 3) sample-major array would be lane-padded to (P, 128)
    in HBM — a 42x read amplification.  Autodiff of this graph reproduces
    the reference's hand-written backward (volumerendering.cu:87-202)."""
    sd = jnp.where(valid, jnp.minimum(sigmas * deltas, SD_CLAMP), 0.0)
    excl = jnp.cumsum(sd, axis=1) - sd
    T = jnp.exp(-excl)
    alpha = 1.0 - jnp.exp(-sd)
    keep = T > T_threshold
    w = jnp.where(valid & keep, alpha * T, 0.0)
    return {
        "opacity": w.sum(axis=1),
        "depth": (w * ts).sum(axis=1),
        "rgb": jnp.einsum("ns,cns->nc", w, rgb_t),
        "ws": w,
        "vr_samples": (valid & keep).sum(axis=1).astype(jnp.int32),
    }


def composite_test_round(
    sigmas: jnp.ndarray,     # (N, S) this round's densities
    rgbs: jnp.ndarray,       # (N, S, 3)
    deltas: jnp.ndarray,     # (N, S)
    ts: jnp.ndarray,         # (N, S)
    sample_valid: jnp.ndarray,  # (N, S) bool
    opacity: jnp.ndarray,    # (N,) running
    depth: jnp.ndarray,      # (N,) running
    rgb: jnp.ndarray,        # (N, 3) running
    alive: jnp.ndarray,      # (N,) bool
    T_threshold: float,
):
    """One round of incremental inference compositing
    (reference volumerendering.cu:205-285): resumes at T = 1 - opacity,
    accumulates this round's samples, and kills converged / no-hit rays.
    Returns updated (opacity, depth, rgb, alive)."""
    sd = jnp.where(sample_valid & alive[:, None],
                   jnp.minimum(sigmas * deltas, SD_CLAMP), 0.0)
    excl = jnp.cumsum(sd, axis=1) - sd
    T0 = (1.0 - opacity)[:, None]
    T = T0 * jnp.exp(-excl)
    alpha = 1.0 - jnp.exp(-sd)
    keep = T > T_threshold
    w = jnp.where(keep, alpha * T, 0.0)

    opacity = opacity + w.sum(axis=1)
    depth = depth + (w * ts).sum(axis=1)
    rgb = rgb + (w[:, :, None] * rgbs).sum(axis=1)

    T_final = T0[:, 0] * jnp.exp(-sd.sum(axis=1))
    alive = alive & (T_final > T_threshold)
    return opacity, depth, rgb, alive
