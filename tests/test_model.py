"""NGP field + occupancy grid lifecycle."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import NGPConfig
from ngp_pl_tpu.models.ngp import NGP
from ngp_pl_tpu.models.occupancy import (
    init_grid_state,
    make_update_density_grid,
    mark_invisible_cells,
)


def tiny_cfg(scale=0.5):
    return NGPConfig(scale=scale, n_levels=4, log2_hashmap_size=12,
                     grid_size=32)


def test_cascades_from_scale():
    assert NGPConfig(scale=0.5).cascades == 1
    assert NGPConfig(scale=1.0).cascades == 2
    assert NGPConfig(scale=4.0).cascades == 4
    assert NGPConfig(scale=16.0).cascades == 6


def test_forward_shapes_and_grads():
    cfg = tiny_cfg()
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.4,
                           maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    sigma, rgb = ngp.forward(params, x, d)
    assert sigma.shape == (64,) and rgb.shape == (64, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))

    def loss(p):
        s, r = ngp.forward(p, x, d)
        return s.sum() + r.sum()

    g = jax.grad(loss)(params)
    gt = np.abs(np.asarray(g["hash_table"]))
    assert gt.max() > 0
    for w in g["sigma_mlp"] + g["rgb_mlp"]:
        assert np.isfinite(np.asarray(w)).all()


def test_hdr_mode():
    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32,
                    rgb_act="None")
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    assert "tonemapper" in params
    x = jnp.zeros((8, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    exp = jnp.full((8, 1), 2.0)
    _, rgb = ngp.forward(params, x, d, exposure=exp)
    assert rgb.shape == (8, 3)
    _, rad = ngp.forward(params, x, d, output_radiance=True)
    assert np.all(np.asarray(rad) >= 0)


def test_grid_update_warmup_and_ema():
    cfg = tiny_cfg()
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    state = init_grid_state(cfg)
    update = make_update_density_grid(ngp, cfg)
    thr = jnp.asarray(5.9, jnp.float32)
    s1 = update(params, state, jax.random.PRNGKey(1), thr, warmup=True)
    # fresh init => sigma ~ exp(small) ~ 1 everywhere visible
    g1 = np.asarray(s1.density_grid)
    assert g1.max() > 0
    assert s1.occ_grid.shape == (cfg.cascades, 32, 32, 32)
    # second update decays unsampled cells at most by factor decay
    s2 = update(params, s1, jax.random.PRNGKey(2), thr, warmup=False)
    g2 = np.asarray(s2.density_grid)
    assert (g2 <= np.maximum(g1, g1.max()) + 1e-4).all()
    assert float(s2.mean_density) > 0


def test_mark_invisible_cells():
    cfg = tiny_cfg()
    state = init_grid_state(cfg)
    # one camera at -z looking towards +z (cells behind it become invisible)
    pose = np.zeros((1, 3, 4), np.float32)
    pose[0, :, :3] = np.eye(3)
    pose[0, 2, 3] = -2.0
    # narrow FOV so box corners fall outside the image -> invisible cells
    K = np.float32([[500, 0, 32], [0, 500, 32], [0, 0, 1]])
    s = mark_invisible_cells(state, jnp.asarray(K), jnp.asarray(pose),
                             cfg=cfg, img_w=64, img_h=64, chunk=2048)
    g = np.asarray(s.density_grid)
    assert (g == -1).any()          # some cells invisible
    assert (g == 0).any()           # some cells visible
    cnt = np.asarray(s.count_grid)
    assert cnt.max() > 0


def test_grid_update_respects_invisible():
    cfg = tiny_cfg()
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    state = init_grid_state(cfg)
    state = state._replace(
        density_grid=state.density_grid.at[0, :100].set(-1.0))
    update = make_update_density_grid(ngp, cfg)
    s = update(params, state, jax.random.PRNGKey(1), jnp.asarray(5.9),
               warmup=True)
    assert (np.asarray(s.density_grid)[0, :100] == -1).all()
    assert (np.asarray(s.occ_grid).reshape(cfg.cascades, -1)[0, :100] == 0).all()
