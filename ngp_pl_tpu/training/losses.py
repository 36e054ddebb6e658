"""Training losses (reference losses.py:41-60).

Per-component dict so callers can log them separately; total = sum of means
(reference train.py:173)."""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ngp_pl_tpu.ops.distortion import distortion_loss, distortion_loss_strided


def nerf_loss(
    results: Dict[str, jnp.ndarray],
    target_rgb: jnp.ndarray,
    *,
    lambda_opacity: float = 1e-3,
    lambda_distortion: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    d = {}
    d["rgb"] = (results["rgb"] - target_rgb) ** 2
    o = results["opacity"] + 1e-10
    # push opacity towards 0 or 1 to kill floaters (losses.py:51-53)
    d["opacity"] = lambda_opacity * (-o * jnp.log(o))
    if "loss_mask" in results:
        # rounds layout: rays truncated by slot caps / round budget carry a
        # biased partial render — exclude them (zero grad, like pool drops)
        m = results["loss_mask"].astype(jnp.float32)
        d["rgb"] = d["rgb"] * m[:, None]
        d["opacity"] = d["opacity"] * m
    if lambda_distortion > 0:
        if "distortion" in results:  # rounds path: accumulated per round
            d["distortion"] = lambda_distortion * results["distortion"]
            if "loss_mask" in results:
                d["distortion"] = d["distortion"] * results[
                    "loss_mask"].astype(jnp.float32)
        elif "valid" in results:     # strided (N, S) layout
            d["distortion"] = lambda_distortion * distortion_loss_strided(
                results["ws"], results["deltas"], results["ts"],
                results["valid"],
            )
            if "loss_mask" in results:
                d["distortion"] = d["distortion"] * results[
                    "loss_mask"].astype(jnp.float32)
        else:                        # CSR pool layout
            d["distortion"] = lambda_distortion * distortion_loss(
                results["ws"], results["deltas"], results["ts"],
                results["ray_idx"], results["pool_valid"], results["offsets"],
                n_rays=target_rgb.shape[0],
            )
    return d


def total_loss(loss_d: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return sum(v.mean() for v in loss_d.values())
