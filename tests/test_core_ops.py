"""Unit tests for morton / packbits / trunc_exp / SH / intersection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_pl_tpu.ops import (
    morton3d,
    morton3d_invert,
    packbits,
    unpackbits,
    ray_aabb_intersect,
    ray_aabb_intersect_single,
    ray_sphere_intersect,
    sh_encode,
    trunc_exp,
)


def ref_morton(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, (256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expected = np.array([ref_morton(*c) for c in coords], dtype=np.uint32)
    np.testing.assert_array_equal(codes, expected)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_packbits_roundtrip():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(1024,)).astype(np.float32)
    bf = packbits(jnp.asarray(grid), 0.0)
    assert bf.dtype == jnp.uint8 and bf.shape == (128,)
    flags = np.asarray(unpackbits(bf))
    np.testing.assert_array_equal(flags, (grid > 0).astype(np.uint8))


def test_trunc_exp_fwd_bwd():
    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0])
    # rtol 4e-6: XLA:CPU's vectorized exp differs from np.exp by ~2 ULP
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=4e-6)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expected, rtol=4e-6)


def test_sh_norm_and_shape():
    rng = np.random.default_rng(2)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray((d + 1) / 2), 4))
    assert out.shape == (128, 16)
    # l=0 constant
    np.testing.assert_allclose(out[:, 0], 0.28209479, rtol=1e-5)
    # l=1 components proportional to -y, z, -x
    np.testing.assert_allclose(out[:, 1], -0.48860251 * d[:, 1], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(out[:, 3], -0.48860251 * d[:, 0], rtol=1e-4,
                               atol=1e-6)


def test_aabb_single():
    rays_o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, -2.0], [5.0, 5.0, 5.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    hits = np.asarray(
        ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                  jnp.full(3, 0.5)))
    np.testing.assert_allclose(hits[0], [1.5, 2.5], atol=1e-6)
    assert hits[1, 0] == -1 and hits[2, 0] == -1


def test_aabb_inside_origin():
    # ray starting inside the box: near clamps to 0
    hits = np.asarray(
        ray_aabb_intersect_single(jnp.zeros((1, 3)),
                                  jnp.asarray([[0.0, 0.0, 1.0]]),
                                  jnp.zeros(3), jnp.full(3, 0.5)))
    np.testing.assert_allclose(hits[0], [0.0, 0.5], atol=1e-6)


def test_aabb_multi_sorted():
    centers = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.0]])
    halfs = jnp.full((2, 3), 0.25)
    cnt, hits_t, idx = ray_aabb_intersect(
        jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]), centers, halfs, 2)
    assert int(cnt[0]) == 2
    # nearer voxel (index 1) first
    assert int(idx[0, 0]) == 1 and int(idx[0, 1]) == 0
    np.testing.assert_allclose(np.asarray(hits_t[0, 0]), [0.75, 1.25], atol=1e-6)


def test_sphere_intersect():
    cnt, hits_t, idx = ray_sphere_intersect(
        jnp.asarray([[0.0, 0.0, -3.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]), 1)
    assert int(cnt[0]) == 1
    np.testing.assert_allclose(np.asarray(hits_t[0, 0]), [2.0, 4.0], atol=1e-5)


def test_pfm_roundtrip(tmp_path):
    """PFM depth IO (reference datasets/depth_utils.py)."""
    import numpy as np
    from ngp_pl_tpu.datasets.depth_utils import read_pfm, write_pfm

    rng = np.random.default_rng(0)
    depth = rng.random((7, 5)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, depth)
    got, scale = read_pfm(p)
    np.testing.assert_allclose(got, depth, rtol=1e-6)
    rgbf = rng.random((4, 6, 3)).astype(np.float32)
    p2 = str(tmp_path / "c.pfm")
    write_pfm(p2, rgbf, scale=2.0)
    got2, scale2 = read_pfm(p2)
    np.testing.assert_allclose(got2, rgbf, rtol=1e-6)
    assert scale2 == 2.0
