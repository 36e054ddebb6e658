"""NSVF format: Synthetic_NeRF/NSVF, BlendedMVS, TanksAndTemples (behavioral
spec: reference datasets/nsvf.py — bbox.txt scene box, rgb/ + pose/ file
pairs with split digit prefixes, test_traj.txt render paths, per-sub-dataset
intrinsics, per-scene bound factors).

Structured as a declarative SceneManifest (see datasets/manifest.py): the
split conventions are lookup tables, the world normalization is a WorldMap
derived from bbox.txt, and pose axis conventions are tags.
"""
from __future__ import annotations

import os

import numpy as np

from ngp_pl_tpu.datasets.base import BaseDataset
from ngp_pl_tpu.datasets.manifest import (
    Frame,
    SceneManifest,
    WorldMap,
    install,
    pinhole_K,
    pose_txt,
    sorted_glob,
)

# file-name digit prefix per split (reference nsvf.py:75-81); synthetic
# scenes use 2_ for test, real captures 1_
_SPLIT_PREFIX = {"train": "0_", "val": "1_", "trainval": "[0-1]_",
                 "trainvaltest": "[0-2]_"}
# scene bounds that need enlarging beyond the 1.05 default (nsvf.py:26-27)
_BOUND_FACTOR = {"Mic": 1.2, "Lego": 1.1}
# (width, height) per sub-dataset family at downsample 1 (nsvf.py:32-51).
# Ignatius precedes Tanks: its path usually contains "TanksAndTemple" too,
# but it ships focal-only intrinsics (reference nsvf.py read_intrinsics
# checks 'Ignatius' in root before the generic Tanks matrix branch)
_FAMILY_WH = {"Synthetic": (800, 800), "BlendedMVS": (768, 576),
              "Ignatius": (1920, 1080), "Tanks": (1920, 1080)}


def _family(root: str) -> str:
    for name in _FAMILY_WH:
        if name in root:
            return name
    raise ValueError(f"unknown NSVF sub-dataset: {root}")


def _scene_world(root: str) -> WorldMap:
    box = np.loadtxt(os.path.join(root, "bbox.txt"))[:6].reshape(2, 3)
    factor = next((v for k, v in _BOUND_FACTOR.items() if k in root), 1.0)
    return WorldMap(shift=((box[1] + box[0]) / 2).astype(np.float32),
                    scale=float((box[1] - box[0]).max() / 2 * 1.05 * factor))


def _intrinsics(root: str, family: str, downsample: float):
    w0, h0 = _FAMILY_WH[family]
    w, h = int(w0 * downsample), int(h0 * downsample)
    path = os.path.join(root, "intrinsics.txt")
    if family in ("Synthetic", "Ignatius"):     # focal-only first token
        with open(path) as f:
            fl = float(f.readline().split()[0]) * downsample
        return pinhole_K(fl, fl, w / 2, h / 2), (w, h)
    K = np.loadtxt(path, dtype=np.float32)[:3, :3]
    K[:2] *= downsample
    return K, (w, h)


def _traj_frames(root: str):
    """Pose-only render trajectory (reference nsvf.py:60-73)."""
    if "Ignatius" in root:
        raw = [pose_txt(p) for p in sorted_glob(root, "test_pose/*.txt")]
    else:
        raw = list(np.loadtxt(os.path.join(root, "test_traj.txt"))
                   .reshape(-1, 4, 4)[:, :3].astype(np.float32))
    return [Frame(pose=p) for p in raw]


def _image_frames(root: str, family: str, split: str):
    prefix = _SPLIT_PREFIX.get(split)
    if prefix is None:
        if family == "Synthetic":
            prefix = "2_"
        elif split == "test":
            prefix = "1_"
        else:
            raise ValueError(f"{split} split not recognized!")
    imgs = sorted_glob(root, "rgb", prefix + "*.png")
    poses = sorted_glob(root, "pose", prefix + "*.txt")
    return [Frame(pose=pose_txt(p), image=img)
            for img, p in zip(imgs, poses)]


class NSVFDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        family = _family(root_dir)
        K, img_wh = _intrinsics(root_dir, family, downsample)

        traj = split == "test_traj"
        frames, world = [], WorldMap()
        if kwargs.get("read_meta", True):
            world = _scene_world(root_dir)
            frames = (_traj_frames(root_dir) if traj
                      else _image_frames(root_dir, family, split))

        install(self, SceneManifest(
            K=K, img_wh=img_wh, frames=frames,
            # stored poses are already [right down front]; the published
            # test trajectories carry [left down front] columns
            convention="ldf" if traj else "rdf",
            world=world,
            # these scenes ship black backgrounds on white-bg captures
            lift_black_to_white=("Jade" in root_dir
                                 or "Fountain" in root_dir),
        ))
