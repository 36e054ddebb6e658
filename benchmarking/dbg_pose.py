import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from ngp_pl_tpu.config import NGPConfig, RenderConfig, TrainConfig
from ngp_pl_tpu.models.ngp import NGP
from ngp_pl_tpu.datasets.ray_utils import axisangle_to_R, get_rays
from ngp_pl_tpu.models.rendering import render_rays_train
from ngp_pl_tpu.training.losses import nerf_loss, total_loss

cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
rcfg = RenderConfig(max_samples=64, train_pool_mult=8)
ngp = NGP(cfg)
params = ngp.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
n_images, n_pix, B = 4, 256, 32
poses = np.zeros((n_images, 3, 4), np.float32); poses[:, :, :3] = np.eye(3); poses[:, 2, 3] = -2.0
poses = jnp.asarray(poses)
dirs_all = jnp.asarray((rng.uniform(-0.2, .2, (n_pix,3)) + np.array([0,0,1.])).astype(np.float32))
img_idxs = jnp.asarray(rng.integers(0, n_images, B), jnp.int32)
pix_idxs = jnp.asarray(rng.integers(0, n_pix, B), jnp.int32)
rgb_gt = jnp.asarray(rng.random((B,3)), jnp.float32)
occ = jnp.ones((cfg.cascades, 32,32,32), jnp.uint8)

def loss_fn(pose_params):
    p = poses[img_idxs]
    dR = axisangle_to_R(pose_params["dR"][img_idxs])
    R = dR @ p[:, :, :3]
    t = p[:, :, 3] + pose_params["dT"][img_idxs]
    p2 = jnp.concatenate([R, t[:, :, None]], axis=-1)
    rays_o, rays_d = get_rays(dirs_all[pix_idxs], p2)
    noise = jnp.zeros((B,))
    out = render_rays_train(ngp, params, occ, rays_o, rays_d, noise,
                            jnp.ones((3,)), rcfg=rcfg, n_samples=8, chain_length=64)
    ld = nerf_loss(out, rgb_gt, lambda_opacity=1e-3, lambda_distortion=0)
    return total_loss(ld)

pp = {"dR": jnp.zeros((n_images,3)), "dT": jnp.zeros((n_images,3))}
g = jax.grad(loss_fn)(pp)
print("dR grad max", float(jnp.abs(g["dR"]).max()))
print("dT grad max", float(jnp.abs(g["dT"]).max()))
