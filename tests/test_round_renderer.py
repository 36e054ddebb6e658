"""Round-based (alive-ray) renderer must match the single-pass renderer."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import NGPConfig, RenderConfig
from ngp_pl_tpu.models.ngp import NGP
from ngp_pl_tpu.models.rendering import make_round_renderer, make_test_renderer


def test_round_matches_single_pass():
    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
    rcfg = RenderConfig(max_samples=256)
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    # scale densities up so rays actually terminate
    params["hash_table"] = params["hash_table"] * 1e3

    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 8:24, 8:24, 8:24] = 1
    occ_grid = jnp.asarray(occ)

    N = 256
    key = jax.random.PRNGKey(1)
    d = (jax.random.normal(key, (N, 3)) * jnp.asarray([[0.3, 0.3, 0.1]])
         + jnp.asarray([[0.0, 0.0, 1.0]]))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (N, 1))

    single = make_test_renderer(ngp, rcfg, chunk=N, pool_mult=256)
    rounds = make_round_renderer(ngp, rcfg)

    out_a = single(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))
    out_b = rounds(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))

    np.testing.assert_allclose(out_b["opacity"], out_a["opacity"], atol=2e-3)
    np.testing.assert_allclose(out_b["rgb"], out_a["rgb"], atol=2e-3)
    np.testing.assert_allclose(out_b["depth"], out_a["depth"], atol=5e-3)


def test_round_renderer_empty_scene():
    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    occ_grid = jnp.zeros((1, 32, 32, 32), jnp.uint8)
    rounds = make_round_renderer(ngp, RenderConfig(max_samples=256))
    rays_o = np.tile([[0.0, 0.0, -1.5]], (16, 1)).astype(np.float32)
    rays_d = np.tile([[0.0, 0.0, 1.0]], (16, 1)).astype(np.float32)
    out = rounds(params, occ_grid, rays_o, rays_d)
    np.testing.assert_allclose(out["opacity"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["rgb"], 1.0, atol=1e-6)  # white bg


@pytest.mark.slow  # ~1 min: whole-loop device renderer cross-validation
def test_device_round_matches_single_pass():
    """The fully device-resident while_loop renderer must match the
    single-pass reference path."""
    from ngp_pl_tpu.models.rendering import make_device_round_renderer

    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
    rcfg = RenderConfig(max_samples=256)
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    params["hash_table"] = params["hash_table"] * 1e3

    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 8:24, 8:24, 8:24] = 1
    occ_grid = jnp.asarray(occ)

    N = 300  # deliberately not a multiple of chunk -> exercises padding
    key = jax.random.PRNGKey(1)
    d = (jax.random.normal(key, (N, 3)) * jnp.asarray([[0.3, 0.3, 0.1]])
         + jnp.asarray([[0.0, 0.0, 1.0]]))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (N, 1))

    single = make_test_renderer(ngp, rcfg, chunk=N, pool_mult=256)
    dev = make_device_round_renderer(ngp, rcfg, chunk=256)

    out_a = single(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))
    out_b = dev(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))

    np.testing.assert_allclose(out_b["opacity"], out_a["opacity"], atol=2e-3)
    np.testing.assert_allclose(out_b["rgb"], out_a["rgb"], atol=2e-3)
    np.testing.assert_allclose(out_b["depth"], out_a["depth"], atol=5e-3)


def test_device_round_renderer_empty_scene():
    from ngp_pl_tpu.models.rendering import make_device_round_renderer

    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    occ_grid = jnp.zeros((1, 32, 32, 32), jnp.uint8)
    dev = make_device_round_renderer(ngp, RenderConfig(max_samples=256),
                                     chunk=64)
    rays_o = np.tile([[0.0, 0.0, -1.5]], (16, 1)).astype(np.float32)
    rays_d = np.tile([[0.0, 0.0, 1.0]], (16, 1)).astype(np.float32)
    out = dev(params, occ_grid, rays_o, rays_d)
    np.testing.assert_allclose(out["opacity"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["rgb"], 1.0, atol=1e-6)


def test_device_round_multicascade_matches_single_pass():
    """Device-round renderer on a cascades>1 / exp-stepping scene (windowed
    mc march) must match the one-shot z-line test renderer."""
    from ngp_pl_tpu.models.rendering import make_device_round_renderer

    cfg = NGPConfig(scale=2.0, n_levels=4, log2_hashmap_size=12,
                    grid_size=32)   # scale>0.5 -> exp_step_factor=1/256
    rcfg = RenderConfig(max_samples=256)
    assert cfg.cascades == 3
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    params["hash_table"] = params["hash_table"] * 1e3

    occ = np.zeros((3, 32, 32, 32), np.uint8)
    occ[0, 8:24, 8:24, 8:24] = 1
    occ[1, 12:20, 12:20, 12:20] = 1
    occ[2, 10:22, 10:22, 14:18] = 1
    occ_grid = jnp.asarray(occ)

    N = 128
    key = jax.random.PRNGKey(1)
    d = (jax.random.normal(key, (N, 3)) * jnp.asarray([[0.3, 0.3, 0.1]])
         + jnp.asarray([[0.0, 0.0, 1.0]]))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.1, -0.05, -5.0]]), (N, 1))

    single = make_test_renderer(ngp, rcfg, chunk=N, pool_mult=256)
    dev = make_device_round_renderer(ngp, rcfg, chunk=N, use_window=True)

    out_a = single(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))
    out_b = dev(params, occ_grid, np.asarray(rays_o), np.asarray(rays_d))
    np.testing.assert_allclose(out_b["opacity"], out_a["opacity"], atol=3e-3)
    np.testing.assert_allclose(out_b["rgb"], out_a["rgb"], atol=3e-3)
    np.testing.assert_allclose(out_b["depth"], out_a["depth"], atol=1e-2)
