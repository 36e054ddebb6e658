"""Loader tests against synthetic on-disk scenes in each reference format.

Each fixture writes a minimal but format-complete scene to tmp_path and
checks the loader's pose conventions, world normalization, and ray payloads
against hand-computed expectations (behavioral spec: reference
datasets/{nerf,nsvf,nerfpp,rtmv,colmap}.py)."""
from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from ngp_pl_tpu.datasets.manifest import (
    Frame,
    SceneManifest,
    WorldMap,
    convention_matrix,
    remap_pose,
)


def _write_png(path, rgb):
    import imageio.v2 as imageio

    imageio.imwrite(path, rgb.astype(np.uint8))


def _some_pose(seed=0):
    rng = np.random.default_rng(seed)
    # a proper rotation + translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    return np.concatenate([q, t[:, None]], axis=1).astype(np.float32)


# -- manifest primitives -----------------------------------------------------

def test_convention_matrix_tags():
    p = _some_pose()
    # rub (Blender): flip columns 1 and 2
    m = p[:, :3] @ convention_matrix("rub")
    assert np.allclose(m[:, 0], p[:, 0])
    assert np.allclose(m[:, 1], -p[:, 1])
    assert np.allclose(m[:, 2], -p[:, 2])
    # luf (Jrender): flip columns 0 and 1
    m = p[:, :3] @ convention_matrix("luf")
    assert np.allclose(m, p[:, :3] * np.float32([-1, -1, 1]))
    # ldf (NSVF trajectories): flip column 0
    m = p[:, :3] @ convention_matrix("ldf")
    assert np.allclose(m, p[:, :3] * np.float32([-1, 1, 1]))
    # identity
    assert np.allclose(p[:, :3] @ convention_matrix("rdf"), p[:, :3])


def test_world_map_modes():
    t = np.float32([3.0, 0.0, 4.0])
    w = WorldMap(radius=1.5)
    assert np.allclose(np.linalg.norm(w.apply(t)), 1.5)
    w = WorldMap(shift=np.float32([1, 0, 0]), scale=2.0)
    assert np.allclose(w.apply(t), [(3 - 1) / 4, 0, 1])
    assert np.allclose(WorldMap().apply(t), t)


def test_remap_pose_rotation_translation_split():
    p = _some_pose(1)
    out = remap_pose(p, "rub", WorldMap(radius=2.0))
    assert np.allclose(out[:, 1], -p[:, 1])
    assert np.allclose(np.linalg.norm(out[:, 3]), 2.0)


# -- Blender / NeRF ----------------------------------------------------------

@pytest.fixture
def blender_scene(tmp_path):
    root = tmp_path / "lego"
    root.mkdir()
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("val", 1), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            _write_png(root / f"{name}.png",
                       rng.integers(0, 255, (8, 8, 4)))
            pose4 = np.eye(4, dtype=np.float32)
            pose4[:3] = _some_pose(i)
            frames.append({"file_path": name,
                           "transform_matrix": pose4.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root)


def test_nerf_loader(blender_scene):
    from ngp_pl_tpu.datasets.nerf import NeRFDataset

    ds = NeRFDataset(blender_scene, split="train", downsample=0.02)
    side = int(800 * 0.02)
    assert ds.img_wh == (side, side)
    assert ds.poses.shape == (3, 3, 4)
    assert ds.rays.shape == (3, side * side, 3)
    # orbit radius normalized to 1.5 (reference nerf.py:72)
    assert np.allclose(np.linalg.norm(ds.poses[:, :, 3], axis=1), 1.5,
                       atol=1e-5)
    # rub -> rdf conversion
    raw = _some_pose(0)
    assert np.allclose(ds.poses[0][:, 1], -raw[:, 1], atol=1e-6)
    assert np.allclose(ds.poses[0][:, 2], -raw[:, 2], atol=1e-6)
    # focal from camera_angle_x (reference nerf.py:26-27)
    assert np.isclose(ds.K[0, 0], 0.5 * 800 / np.tan(0.35) * 0.02)
    # trainval merges both frame lists
    ds2 = NeRFDataset(blender_scene, split="trainval", downsample=0.02)
    assert ds2.poses.shape[0] == 4
    # read_meta=False: intrinsics only
    ds3 = NeRFDataset(blender_scene, split="train", downsample=0.02,
                      read_meta=False)
    assert ds3.poses.shape[0] == 0 and ds3.K.shape == (3, 3)


# -- NSVF --------------------------------------------------------------------

@pytest.fixture
def nsvf_scene(tmp_path):
    root = tmp_path / "Synthetic_NeRF" / "Lego"
    (root / "rgb").mkdir(parents=True)
    (root / "pose").mkdir()
    np.savetxt(root / "bbox.txt",
               np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    with open(root / "intrinsics.txt", "w") as f:
        f.write("1111.0 400.0 400.0 0\n0 0 0\n")
    rng = np.random.default_rng(1)
    for prefix, n in (("0", 3), ("1", 1), ("2", 2)):
        for i in range(n):
            _write_png(root / "rgb" / f"{prefix}_{i:03d}.png",
                       rng.integers(0, 255, (8, 8, 3)))
            pose4 = np.eye(4, dtype=np.float32)
            pose4[:3] = _some_pose(10 + i)
            np.savetxt(root / "pose" / f"{prefix}_{i:03d}.txt", pose4)
    traj = np.stack([np.eye(4)] * 4)
    np.savetxt(root / "test_traj.txt", traj.reshape(-1, 4))
    return str(root)


def test_nsvf_loader(nsvf_scene):
    from ngp_pl_tpu.datasets.nsvf import NSVFDataset

    ds = NSVFDataset(nsvf_scene, split="train", downsample=0.01)
    assert ds.img_wh == (8, 8)
    assert ds.poses.shape == (3, 3, 4)
    assert ds.rays.shape == (3, 64, 3)
    # world: bbox [-1,1]^3 -> shift 0, scale 1.05 * 1.1 (Lego factor),
    # translation divided by 2*scale (reference nsvf.py:20-27, 56)
    raw_t = _some_pose(10)[:, 3]
    assert np.allclose(ds.poses[0][:, 3], raw_t / (2 * 1.05 * 1.1),
                       atol=1e-6)
    # rotation unchanged (rdf storage)
    assert np.allclose(ds.poses[0][:, :3], _some_pose(10)[:, :3], atol=1e-6)
    # test split of synthetic scenes is prefix 2_
    ds_t = NSVFDataset(nsvf_scene, split="test", downsample=0.01)
    assert ds_t.poses.shape[0] == 2
    # pose-only trajectory: ldf -> rdf flips column 0
    ds_j = NSVFDataset(nsvf_scene, split="test_traj", downsample=0.01)
    assert ds_j.poses.shape == (4, 3, 4)
    assert np.allclose(ds_j.poses[0][:, 0], [-1, 0, 0])
    assert len(ds_j.rays) == 0


# -- NeRF++ ------------------------------------------------------------------

@pytest.fixture
def nerfpp_scene(tmp_path):
    root = tmp_path / "scene"
    rng = np.random.default_rng(2)
    for split, n in (("train", 3), ("val", 1), ("test", 2)):
        for sub in ("rgb", "pose", "intrinsics"):
            (root / split / sub).mkdir(parents=True)
        for i in range(n):
            _write_png(root / split / "rgb" / f"{i:05d}.png",
                       rng.integers(0, 255, (6, 9, 3)))
            pose4 = np.eye(4, dtype=np.float32)
            pose4[:3] = _some_pose(20 + i)
            np.savetxt(root / split / "pose" / f"{i:05d}.txt",
                       pose4.reshape(1, 16))
            K4 = np.eye(4)
            K4[0, 0] = K4[1, 1] = 500.0
            K4[0, 2], K4[1, 2] = 4.5, 3.0
            np.savetxt(root / split / "intrinsics" / f"{i:05d}.txt",
                       K4.reshape(1, 16))
    (root / "camera_path" / "pose").mkdir(parents=True)
    for i in range(5):
        np.savetxt(root / "camera_path" / "pose" / f"{i:05d}.txt",
                   np.eye(4).reshape(1, 16))
    return str(root)


def test_nerfpp_loader(nerfpp_scene):
    from ngp_pl_tpu.datasets.nerfpp import NeRFPPDataset

    ds = NeRFPPDataset(nerfpp_scene, split="train", downsample=1.0)
    assert ds.img_wh == (9, 6)
    assert ds.poses.shape == (3, 3, 4)
    assert ds.rays.shape == (3, 54, 3)
    # poses pass through unmodified (pre-normalized by the dataset author)
    assert np.allclose(ds.poses[0], _some_pose(20), atol=1e-6)
    ds_tv = NeRFPPDataset(nerfpp_scene, split="trainval", downsample=1.0)
    assert ds_tv.poses.shape[0] == 4
    ds_j = NeRFPPDataset(nerfpp_scene, split="test_traj", downsample=1.0)
    assert ds_j.poses.shape == (5, 3, 4) and len(ds_j.rays) == 0


# -- RTMV --------------------------------------------------------------------

@pytest.fixture
def rtmv_scene(tmp_path):
    root = tmp_path / "bricks" / "scene0"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(8):
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3] = _some_pose(30 + i).astype(np.float64)
        meta = {"camera_data": {
            "scene_center_3d_box": [0.5, 0, 0],
            "scene_min_3d_box": [-1.5, -2, -2],
            "scene_max_3d_box": [2.5, 2, 2],
            "width": 10, "height": 10,
            "intrinsics": {"fx": 500.0, "fy": 500.0, "cx": 5.0, "cy": 5.0},
            # stored column-major: transpose of the c2w matrix
            "cam2world": c2w.T.tolist(),
        }}
        with open(root / f"{i:05d}.json", "w") as f:
            json.dump(meta, f)
        _write_png(root / "images" / f"{i:05d}.png",
                   rng.integers(0, 255, (10, 10, 3)))
    return str(root)


def test_rtmv_loader(rtmv_scene):
    from ngp_pl_tpu.datasets.rtmv import RTMVDataset

    ds = RTMVDataset(rtmv_scene, split="train", downsample=1.0)
    # train keeps the first 100 -> all 8 frames here
    assert ds.poses.shape == (8, 3, 4)
    assert ds.rays.shape == (8, 100, 3)
    raw = _some_pose(30)
    # rub -> rdf column flips
    assert np.allclose(ds.poses[0][:, 1], -raw[:, 1], atol=1e-5)
    assert np.allclose(ds.poses[0][:, 2], -raw[:, 2], atol=1e-5)
    # bricks: scene box (max extent 4, center [0.5, 0, 0]) normalization
    scale = 4 / 2 * 1.05
    assert np.allclose(ds.poses[0][:, 3],
                       (raw[:, 3] - np.float32([0.5, 0, 0])) / (2 * scale),
                       atol=1e-5)


# -- COLMAP ------------------------------------------------------------------

def _write_colmap_binary(root, poses_w2c, names, pts3d, w=12, h=8):
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    with open(os.path.join(root, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        # SIMPLE_PINHOLE(id 0): f, cx, cy
        f.write(struct.pack("<iiQQ", 1, 0, w, h))
        f.write(struct.pack("<ddd", 100.0, w / 2, h / 2))
    from ngp_pl_tpu.datasets.colmap_utils import rotmat2qvec

    with open(os.path.join(root, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(poses_w2c)))
        for i, (pose, name) in enumerate(zip(poses_w2c, names)):
            q = rotmat2qvec(pose[:, :3])
            f.write(struct.pack("<idddddddi", i + 1, *q, *pose[:, 3], 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(os.path.join(root, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts3d)))
        for i, xyz in enumerate(pts3d):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz, 0, 0, 0, 0.5))
            f.write(struct.pack("<Q", 0))


@pytest.fixture
def colmap_scene(tmp_path):
    root = str(tmp_path / "scene")
    rng = np.random.default_rng(4)
    n = 10
    poses_w2c, names = [], []
    os.makedirs(os.path.join(root, "images"))
    for i in range(n):
        c2w = np.eye(4)
        c2w[:3] = _some_pose(40 + i).astype(np.float64)
        c2w[:3, 3] *= 3.0
        w2c = np.linalg.inv(c2w)
        poses_w2c.append(w2c[:3])
        names.append(f"im_{i:04d}.png")
        _write_png(os.path.join(root, "images", names[-1]),
                   rng.integers(0, 255, (8, 12, 3)))
    pts3d = rng.normal(size=(50, 3))
    _write_colmap_binary(root, poses_w2c, names, pts3d)
    return root


def test_colmap_loader(colmap_scene):
    from ngp_pl_tpu.datasets.colmap import ColmapDataset

    ds = ColmapDataset(colmap_scene, split="train", downsample=1.0)
    # every 8th image is test: 10 images -> 8 train (i % 8 != 0), 2 test
    assert ds.poses.shape == (8, 3, 4)
    assert ds.rays.shape == (8, 96, 3)
    ds_t = ColmapDataset(colmap_scene, split="test", downsample=1.0)
    assert ds_t.poses.shape == (2, 3, 4)
    # nearest camera sits at distance 1 after normalization (colmap.py:74-76)
    all_d = np.linalg.norm(
        np.concatenate([ds.poses[:, :, 3], ds_t.poses[:, :, 3]]), axis=1)
    assert np.isclose(all_d.min(), 1.0, atol=1e-5)
    # rotations stay orthonormal through centering
    R = ds.poses[0][:, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    ds_j = ColmapDataset(colmap_scene, split="test_traj", downsample=1.0)
    assert ds_j.poses.shape == (120, 3, 4)
