"""Native C++ host-path components: compile, parity with the numpy fallback.

The reference delegates this work to torch DataLoader workers + python image
conversion (reference train.py:141-152, datasets/color_utils.py:19-27); here
it is a ctypes-loaded C++ library with numpy fallbacks.
"""
import numpy as np
import pytest

from ngp_pl_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


@requires_native
def test_sample_batch_f32_shapes_and_bounds():
    rng = np.random.default_rng(0)
    rays = rng.random((7, 50, 3), np.float32)
    out = native.sample_batch(rays, 4096, "all_images", seed=123)
    assert out is not None
    assert out["img_idxs"].shape == (4096,)
    assert out["rgb"].shape == (4096, 3)
    assert out["img_idxs"].min() >= 0 and out["img_idxs"].max() < 7
    assert out["pix_idxs"].min() >= 0 and out["pix_idxs"].max() < 50
    # gathered payloads must match the store at the returned indices
    np.testing.assert_array_equal(
        out["rgb"], rays[out["img_idxs"], out["pix_idxs"]])
    # uniformity smoke test: every image should be drawn
    assert len(np.unique(out["img_idxs"])) == 7


@requires_native
def test_sample_batch_same_image_strategy():
    rays = np.random.default_rng(0).random((5, 30, 3)).astype(np.float32)
    out = native.sample_batch(rays, 256, "same_image", seed=7)
    assert len(np.unique(out["img_idxs"])) == 1


@requires_native
def test_sample_batch_exposure_channel():
    rays = np.random.default_rng(0).random((3, 20, 4)).astype(np.float32)
    out = native.sample_batch(rays, 64, "all_images", seed=1)
    assert out["exposure"].shape == (64, 1)
    np.testing.assert_array_equal(
        out["exposure"][:, 0], rays[out["img_idxs"], out["pix_idxs"], 3])


@requires_native
def test_sample_batch_u8_normalization():
    rays = np.random.default_rng(0).integers(
        0, 256, (4, 25, 3), dtype=np.uint8)
    out = native.sample_batch(rays, 128, "all_images", seed=3)
    expect = rays[out["img_idxs"], out["pix_idxs"]].astype(np.float32) / 255.0
    np.testing.assert_allclose(out["rgb"], expect, atol=1e-6)


@requires_native
def test_sample_batch_deterministic_by_seed():
    rays = np.random.default_rng(0).random((4, 40, 3)).astype(np.float32)
    a = native.sample_batch(rays, 512, "all_images", seed=42)
    b = native.sample_batch(rays, 512, "all_images", seed=42)
    c = native.sample_batch(rays, 512, "all_images", seed=43)
    np.testing.assert_array_equal(a["pix_idxs"], b["pix_idxs"])
    assert not np.array_equal(a["pix_idxs"], c["pix_idxs"])


@requires_native
def test_u8_to_rays_blend_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (100, 4), dtype=np.uint8)
    got = native.u8_to_rays(img, blend_a=True)
    f = img.astype(np.float32) / 255.0
    expect = f[:, :3] * f[:, 3:] + (1 - f[:, 3:])
    np.testing.assert_allclose(got, expect, atol=1e-6)
    got_pm = native.u8_to_rays(img, blend_a=False, premultiply=True)
    np.testing.assert_allclose(got_pm, f[:, :3] * f[:, 3:], atol=1e-6)


@requires_native
def test_downsample_box_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.random((8, 12, 3)).astype(np.float32)
    got = native.downsample_box(img, 4)
    expect = img.reshape(2, 4, 3, 4, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_dataset_fallback_without_native(monkeypatch):
    """BaseDataset.sample_batch must work when the native lib is absent."""
    from ngp_pl_tpu.datasets.base import BaseDataset

    monkeypatch.setattr(native, "sample_batch", lambda *a, **k: None)
    ds = BaseDataset.__new__(BaseDataset)
    ds.rays = np.random.default_rng(0).random((3, 16, 3)).astype(np.float32)
    ds.poses = np.zeros((3, 3, 4), np.float32)
    ds.img_wh = (4, 4)
    ds.batch_size = 32
    ds.ray_sampling_strategy = "all_images"
    ds.split = "train"
    batch = ds.sample_batch(np.random.default_rng(0))
    assert batch["rgb"].shape == (32, 3)
    np.testing.assert_array_equal(
        batch["rgb"], ds.rays[batch["img_idxs"], batch["pix_idxs"], :3])


def test_dataset_uses_native_when_available():
    from ngp_pl_tpu.datasets.base import BaseDataset

    if not native.available():
        pytest.skip("native toolchain unavailable")
    ds = BaseDataset.__new__(BaseDataset)
    ds.rays = np.random.default_rng(0).random((3, 16, 3)).astype(np.float32)
    ds.poses = np.zeros((3, 3, 4), np.float32)
    ds.img_wh = (4, 4)
    ds.batch_size = 32
    ds.ray_sampling_strategy = "all_images"
    ds.split = "train"
    batch = ds.sample_batch(np.random.default_rng(0))
    np.testing.assert_array_equal(
        batch["rgb"], ds.rays[batch["img_idxs"], batch["pix_idxs"], :3])
