"""Image IO helpers (reference datasets/color_utils.py)."""
from __future__ import annotations

import numpy as np


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    img = np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img)
    return np.minimum(img, 1.0)  # "clamp" tonemapper


def read_image(img_path, img_wh, blend_a=True):
    """Load an image -> flattened (H*W, 3) float32 in [0, 1].

    RGBA images are alpha-blended onto white (blend_a) or premultiplied
    (reference color_utils.py:19-30)."""
    import imageio.v2 as imageio

    raw = imageio.imread(img_path)
    if raw.ndim == 2:
        raw = np.repeat(raw[..., None], 3, axis=-1)
    h, w = raw.shape[:2]
    img = None
    if raw.dtype == np.uint8:
        from ngp_pl_tpu import native

        flat = native.u8_to_rays(
            np.ascontiguousarray(raw.reshape(h * w, raw.shape[-1])),
            blend_a=blend_a, premultiply=not blend_a)
        if flat is not None:
            img = flat.reshape(h, w, 3)
    if img is None:
        img = raw.astype(np.float32) / 255.0
        if img.shape[-1] == 4:
            if blend_a:
                img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
            else:
                img = img[..., :3] * img[..., -1:]
    if (img.shape[1], img.shape[0]) != tuple(img_wh):
        import cv2

        img = cv2.resize(img, tuple(img_wh))
    return img.reshape(-1, 3)
