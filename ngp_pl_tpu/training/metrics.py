"""Evaluation metrics: PSNR / SSIM in jnp, optional LPIPS.

The reference uses torchmetrics (reference train.py:27-31, 62-68) plus
standalone mse/psnr helpers (reference metrics.py).  SSIM here is the standard
Gaussian-window (11, sigma 1.5) formulation matching torchmetrics defaults.
LPIPS requires pretrained VGG weights; it is exposed behind a hook that
activates only when the `lpips` package and its weights are available
(hermetic images have neither).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(image_pred, image_gt, valid_mask=None):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    return jnp.mean(value)


def psnr(image_pred, image_gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(img0, img1, max_val=1.0):
    """img: (H, W, C) in [0, max_val]. Returns scalar mean SSIM."""
    kernel = _gaussian_kernel()
    k = kernel[None, None]                                    # (1, 1, 11, 11)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(x):
        # x: (H, W, C) -> depthwise conv
        xt = jnp.transpose(x, (2, 0, 1))[:, None]            # (C, 1, H, W)
        y = jax.lax.conv_general_dilated(
            xt, jnp.broadcast_to(k, (1, 1, 11, 11)),
            window_strides=(1, 1), padding="VALID")
        return y[:, 0]                                        # (C, H', W')

    mu0 = filt(img0)
    mu1 = filt(img1)
    # clamp variances at 0: the E[x^2]-E[x]^2 form can go slightly negative
    # in fp32 on near-constant regions, pushing SSIM > 1
    s00 = jnp.maximum(filt(img0 * img0) - mu0 * mu0, 0.0)
    s11 = jnp.maximum(filt(img1 * img1) - mu1 * mu1, 0.0)
    s01 = filt(img0 * img1) - mu0 * mu1
    s01 = jnp.sign(s01) * jnp.minimum(jnp.abs(s01), jnp.sqrt(s00 * s11))
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 * mu0 + mu1 * mu1 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


class LPIPSHook:
    """Lazy LPIPS(vgg) evaluator using the pure-JAX implementation
    (ngp_pl_tpu.training.lpips_jax).

    Weight discovery order:
      1. NGP_PL_TPU_LPIPS_NPZ env var -> npz in our naming scheme
      2. the `lpips` pip package's pretrained weights (converted once)
    Inactive (validation skips the metric) when neither is available —
    hermetic images ship no pretrained perceptual weights."""

    def __init__(self):
        self._fn = None
        self._tried = False

    @property
    def available(self) -> bool:
        if not self._tried:
            self._tried = True
            import os

            from ngp_pl_tpu.training import lpips_jax

            params = None
            npz = os.environ.get("NGP_PL_TPU_LPIPS_NPZ")
            if npz and os.path.exists(npz):
                params = lpips_jax.load_weights_npz(npz)
            else:
                import tempfile

                cache = os.path.join(tempfile.gettempdir(),
                                     "ngp_pl_tpu_lpips_vgg.npz")
                if not os.path.exists(cache):
                    try:
                        lpips_jax.export_from_torch_lpips(cache)
                    except Exception:
                        pass
                if os.path.exists(cache):
                    params = lpips_jax.load_weights_npz(cache)
            if params is not None:
                fn = lpips_jax.make_lpips_fn(params)
                self._fn = lambda pred, gt: float(
                    fn(jnp.asarray(pred, jnp.float32),
                       jnp.asarray(gt, jnp.float32)))
        return self._fn is not None

    def __call__(self, pred, gt):
        if not self.available:
            return None
        return self._fn(pred, gt)
