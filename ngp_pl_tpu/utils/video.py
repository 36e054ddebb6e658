"""Test-trajectory video export (reference train.py:284-293 writes rgb/depth
mp4s via imageio).  Falls back to GIF when no ffmpeg backend is present."""
from __future__ import annotations

import os
from typing import List

import numpy as np


def write_video(path: str, frames: List[np.ndarray], fps: int = 30):
    """frames: list of (H, W, 3) uint8.  Writes mp4 if an ffmpeg backend is
    available, else a GIF next to the requested path."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        imageio.mimsave(path, frames, fps=fps)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(alt, frames, duration=1.0 / fps)
        return alt


def render_trajectory_video(render_image, params, occ_grid, poses, directions,
                            img_wh, out_dir: str, name: str, fps: int = 30):
    """Render every pose and write rgb + turbo-depth videos
    (reference train.py:284-293)."""
    from ngp_pl_tpu.training.system import depth2img

    w, h = img_wh
    rgb_frames, depth_frames = [], []
    for pose in poses:
        rays_d = directions @ pose[:, :3].T
        rays_o = np.broadcast_to(pose[:, 3], rays_d.shape)
        out = render_image(params, occ_grid, rays_o, rays_d)
        rgb_frames.append(
            (np.clip(out["rgb"].reshape(h, w, 3), 0, 1) * 255).astype(np.uint8))
        depth_frames.append(depth2img(out["depth"].reshape(h, w)))
    p1 = write_video(os.path.join(out_dir, f"{name}_rgb.mp4"), rgb_frames, fps)
    p2 = write_video(os.path.join(out_dir, f"{name}_depth.mp4"), depth_frames,
                     fps)
    return p1, p2
