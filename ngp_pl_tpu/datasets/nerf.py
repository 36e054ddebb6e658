"""NeRF-synthetic (Blender) loader (reference datasets/nerf.py)."""
from __future__ import annotations

import json
import os

import numpy as np

from ngp_pl_tpu.datasets.base import BaseDataset
from ngp_pl_tpu.datasets.color_utils import read_image
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions


class NeRFDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split)

    def read_intrinsics(self):
        with open(os.path.join(self.root_dir, "transforms_train.json")) as f:
            meta = json.load(f)
        w = h = int(800 * self.downsample)
        fx = fy = 0.5 * 800 / np.tan(0.5 * meta["camera_angle_x"]) * self.downsample
        self.K = np.float32([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        self.directions = get_ray_directions(h, w, self.K)
        self.img_wh = (w, h)

    def _scene_scale_shift(self):
        """Per-scene pose-radius scaling (reference nerf.py:55-79)."""
        if "Jrender_Dataset" in self.root_dir:
            scene = os.path.basename(os.path.normpath(self.root_dir))
            radius = {"Easyship": 1.2, "Scar": 1.8, "Coffee": 2.5,
                      "Car": 0.8}.get(scene, 1.5)
            shift = {"Coffee": np.float32([0, -0.4465, 0]),
                     "Car": np.float32([-0.7, 0, 0])}.get(
                         scene, np.zeros(3, np.float32))
            return radius, shift, True
        return 1.5, np.zeros(3, np.float32), False

    def read_meta(self, split):
        if split == "trainval":
            frames = []
            for s in ("train", "val"):
                with open(os.path.join(self.root_dir,
                                       f"transforms_{s}.json")) as f:
                    frames += json.load(f)["frames"]
        else:
            with open(os.path.join(self.root_dir,
                                   f"transforms_{split}.json")) as f:
                frames = json.load(f)["frames"]

        radius, shift, jrender = self._scene_scale_shift()
        rays, poses = [], []
        for frame in frames:
            c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
            if jrender:
                c2w[:, :2] *= -1  # [left up front] -> [right down front]
            else:
                c2w[:, 1:3] *= -1  # [right up back] -> [right down front]
            c2w[:, 3] *= radius / np.linalg.norm(c2w[:, 3])
            c2w[:, 3] += shift
            poses.append(c2w)
            img_path = os.path.join(self.root_dir, f"{frame['file_path']}.png")
            if os.path.exists(img_path):
                rays.append(read_image(img_path, self.img_wh))
        if rays:
            self.rays = np.stack(rays).astype(np.float32)
        self.poses = np.stack(poses).astype(np.float32)
