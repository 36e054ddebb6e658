"""Base dataset: ray storage + batch sampling (reference datasets/base.py).

All images are pre-loaded to host RAM as one (N_images, H*W, 3 or 4) float32
array (`rays`; the 4th channel, when present, is HDR-NeRF exposure).  A train
"epoch" is 1000 virtual iterations (reference base.py:17-20); each train batch
samples `batch_size` random (image, pixel) pairs under one of two strategies
(reference base.py:25-30).  There is no torch DataLoader — batches are cheap
index gathers produced on demand by `sample_batch`.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class BaseDataset:
    def __init__(self, root_dir: str, split: str = "train",
                 downsample: float = 1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        # populated by subclasses:
        self.rays: np.ndarray = np.zeros((0, 0, 3), np.float32)
        self.poses: np.ndarray = np.zeros((0, 3, 4), np.float32)
        self.directions: np.ndarray = np.zeros((0, 3), np.float32)
        self.K: np.ndarray = np.eye(3, dtype=np.float32)
        self.img_wh = (0, 0)
        # training knobs (set by the training system, reference train.py:106-108)
        self.batch_size = 8192
        self.ray_sampling_strategy = "all_images"

    def read_intrinsics(self):
        raise NotImplementedError

    def __len__(self):
        if self.split.startswith("train"):
            return 1000
        return len(self.poses)

    @property
    def has_exposure(self) -> bool:
        return self.rays.ndim == 3 and self.rays.shape[-1] == 4

    def sample_batch(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """One training batch of random rays (reference base.py:24-35).

        Uses the native threaded sampler (ngp_pl_tpu.native) when available;
        falls back to numpy fancy indexing otherwise."""
        n_img = len(self.poses)
        n_pix = self.img_wh[0] * self.img_wh[1]
        if n_img and n_pix and self.rays.size:
            from ngp_pl_tpu import native

            out = native.sample_batch(
                self.rays, self.batch_size, self.ray_sampling_strategy,
                int(rng.integers(0, 2 ** 62)))
            if out is not None:
                if self.has_exposure and "exposure" not in out:
                    out["exposure"] = self.rays[
                        out["img_idxs"], out["pix_idxs"], 3:]
                return out
        if self.ray_sampling_strategy == "all_images":
            img_idxs = rng.integers(0, n_img, self.batch_size)
        elif self.ray_sampling_strategy == "same_image":
            img_idxs = np.full(self.batch_size, rng.integers(0, n_img))
        else:
            raise ValueError(self.ray_sampling_strategy)
        pix_idxs = rng.integers(0, n_pix, self.batch_size)
        rays = self.rays[img_idxs, pix_idxs]
        batch = {
            "img_idxs": img_idxs.astype(np.int32),
            "pix_idxs": pix_idxs.astype(np.int32),
            "rgb": rays[:, :3],
        }
        if self.has_exposure:
            batch["exposure"] = rays[:, 3:]
        return batch

    def test_item(self, idx: int) -> Dict[str, np.ndarray]:
        """One test view (reference base.py:37-42)."""
        sample = {"pose": self.poses[idx], "img_idxs": idx}
        if len(self.rays) > 0:
            rays = self.rays[idx]
            sample["rgb"] = rays[:, :3]
            if self.has_exposure:
                sample["exposure"] = rays[0, 3]
        return sample

    def __getitem__(self, idx: int):
        if self.split.startswith("train"):
            return self.sample_batch(np.random.default_rng())
        return self.test_item(idx)
