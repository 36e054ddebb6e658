"""Mip-NeRF-360 distortion loss in DVGO-v2 prefix-sum form.

Replaces `distortion_loss_fw` / `distortion_loss_bw`
(reference models/csrc/losses.cu:9-175; formula from
https://arxiv.org/pdf/2206.05085.pdf):

    loss_ray = sum_s [ 2 * (wts_in_s * ws_ex_s - ws_in_s * wts_ex_s)
                       + (1/3) * w_s^2 * delta_s ]

where *_in / *_ex are inclusive / exclusive prefix sums of ws and ws*ts within
the ray's segment.  The reference runs thrust scans per ray inside the kernel;
here it is the same segment cumsum used by the compositor, and JAX autodiff
reproduces the hand-written backward (losses.cu:112-175) — checked against
finite differences in tests/test_distortion.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ngp_pl_tpu.ops.volume_render import segment_excl_cumsum


def distortion_loss(
    ws: jnp.ndarray,        # (P,) sample weights
    deltas: jnp.ndarray,    # (P,)
    ts: jnp.ndarray,        # (P,)
    ray_idx: jnp.ndarray,   # (P,)
    valid: jnp.ndarray,     # (P,) bool
    offsets: jnp.ndarray,   # (N_rays,)
    n_rays: int,
) -> jnp.ndarray:
    """Per-ray distortion loss (N_rays,)."""
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_ex = segment_excl_cumsum(w, offsets, ray_idx)
    wts_ex = segment_excl_cumsum(wt, offsets, ray_idx)
    ws_in = ws_ex + w
    wts_in = wts_ex + wt
    per_sample = 2.0 * (wts_in * ws_ex - ws_in * wts_ex) + (w * w * deltas) / 3.0
    seg = jnp.where(valid, ray_idx, n_rays)
    return jax.ops.segment_sum(per_sample, seg, num_segments=n_rays + 1)[:-1]


def distortion_loss_strided(
    ws: jnp.ndarray,        # (N, S) sample weights
    deltas: jnp.ndarray,    # (N, S)
    ts: jnp.ndarray,        # (N, S)
    valid: jnp.ndarray,     # (N, S) bool
) -> jnp.ndarray:
    """Per-ray distortion loss (N,), strided layout: the per-ray prefix
    sums of the DVGO-v2 form become plain lane-axis cumsums over S (the CSR
    variant's segment scans cost global-cumsum + segment_sum passes)."""
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_in = jnp.cumsum(w, axis=1)
    wts_in = jnp.cumsum(wt, axis=1)
    ws_ex = ws_in - w
    wts_ex = wts_in - wt
    per_sample = 2.0 * (wts_in * ws_ex - ws_in * wts_ex) + (w * w * deltas) / 3.0
    return per_sample.sum(axis=1)
