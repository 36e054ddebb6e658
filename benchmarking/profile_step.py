#!/usr/bin/env python
"""Ablation profiler: per-stage timings of the training step at bench shapes.

Reproduces the bench.py operating point on the hollow synthetic scene and
times each stage of the strided train step in isolation: march, field fwd,
field fwd+bwd, fused encode fwd/bwd, composite, optimizer.  Prints a table
to stderr.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def timeit(name, fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    # fence via scalar transfer (block_until_ready may be a no-op on axon)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    B = int(os.environ.get("PROF_BATCH", 8192))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=B,
                       num_epochs=30, exp_name="prof", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    warm = int(os.environ.get("PROF_WARM", 192))
    print("warming to steady state...", file=sys.stderr, flush=True)
    for i in range(warm):
        m = system.step()
    float(np.asarray(m["loss"]))
    print(f"steady: S {system._pool_mult} chain {system.chain_length} "
          f"rm_s {float(np.asarray(m['rm_samples']))/B:.1f} "
          f"vr_s {float(np.asarray(m['vr_samples']))/B:.1f}",
          file=sys.stderr, flush=True)

    S = system._pool_mult
    chain = system.chain_length

    # 1. full step
    timeit("full step", lambda: system.step()["loss"])

    ngp = system.ngp
    cfg = system.cfg
    rcfg = system.rcfg
    params = system.state.params
    occ = system.grid_state.occ_grid
    occ_rows = system.grid_state.occ_rows

    # shared ray batch (same distribution as training)
    rng = np.random.default_rng(0)
    img_idxs = rng.integers(0, len(train_ds.poses), B)
    pix_idxs = rng.integers(0, train_ds.directions.shape[0], B)
    poses = np.asarray(train_ds.poses)[img_idxs]
    dirs = np.asarray(train_ds.directions)[pix_idxs]
    rays_d = np.einsum("nij,nj->ni", poses[:, :, :3], dirs)
    rays_o = poses[:, :, 3]
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)
    noise = jnp.asarray(rng.random(B), jnp.float32)

    from ngp_pl_tpu.models.rendering import render_rays_train, scene_hits
    from ngp_pl_tpu.ops.ray_march import march_rays_train_strided

    hits = scene_hits(rays_o, rays_d, cfg.scale)
    win_rows = system.grid_state.win_rows

    # 2. march only (strided, windowed occupancy)
    @jax.jit
    def march_only(win_rows):
        m = march_rays_train_strided(
            rays_o, rays_d, hits, noise, None, cascades=cfg.cascades,
            scale=cfg.scale, exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
            n_samples=S, chain_length=chain, win_rows=win_rows)
        return m.ts, m.deltas, m.valid, m.counts, m.total
    ts, deltas, valid, counts, total = march_only(win_rows)
    timeit("march (strided window)", march_only, win_rows)

    # sample positions for field-only timings
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    print(f"slots {B * S} real samples {int(np.asarray(total))}",
          file=sys.stderr, flush=True)

    # 3. field fwd only
    @jax.jit
    def field_fwd(params):
        s, r = ngp.forward_rays(params, xyz, rays_d)
        return s.sum() + r.sum()
    timeit("field fwd", field_fwd, params)

    # 4. field fwd+bwd
    @jax.jit
    def field_grad(params):
        def f(p):
            s, r = ngp.forward_rays(p, xyz, rays_d)
            return s.sum() + r.sum()
        gt = jax.grad(f)(params)["hash_table"]
        return jnp.vdot(gt, gt)
    timeit("field fwd+bwd", field_grad, params)

    # 5. fused encode+mlp fwd / fwd+bwd
    from ngp_pl_tpu.ops.hash_encoding import hash_encode_mlp
    xn = ((xyz + cfg.scale) / (2 * cfg.scale)).reshape(B * S, 3)

    @jax.jit
    def enc_fwd(params):
        return hash_encode_mlp(xn, params["hash_table"],
                               params["sigma_mlp"][0], ngp.spec,
                               need_x_grad=False).sum()
    timeit("encode+l1 fwd", enc_fwd, params)

    @jax.jit
    def enc_grad(params):
        def f(p):
            return hash_encode_mlp(xn, p["hash_table"], p["sigma_mlp"][0],
                                   ngp.spec, need_x_grad=False).sum()
        gt = jax.grad(f)(params)["hash_table"]
        return jnp.vdot(gt, gt)
    timeit("encode+l1 fwd+bwd", enc_grad, params)

    # 6. composite fwd+bwd
    from ngp_pl_tpu.ops.volume_render import composite_train_strided
    sigmas, rgbs = ngp.forward_rays(params, xyz, rays_d)
    sigmas = jax.block_until_ready(sigmas)

    @jax.jit
    def comp_grad(sigmas, rgbs):
        def f(s, r):
            out = composite_train_strided(s, r, deltas, ts, valid,
                                          T_threshold=rcfg.t_threshold)
            return out["rgb"].sum() + out["depth"].sum()
        gs, gr = jax.grad(f, argnums=(0, 1))(sigmas, rgbs)
        return gs.sum() + gr.sum()
    timeit("composite fwd+bwd", comp_grad, sigmas, rgbs)

    # 7. full render fwd (no grad)
    @jax.jit
    def render_fwd(params, occ, win_rows):
        out = render_rays_train(
            ngp, params, occ, rays_o, rays_d, noise,
            jnp.ones((3,), jnp.float32), rcfg=rcfg, n_samples=S,
            chain_length=chain, win_rows=win_rows)
        return out["rgb"].sum()
    timeit("render fwd (march+field+composite)", render_fwd, params, occ,
           win_rows)

    # 8. full render fwd+bwd
    @jax.jit
    def render_grad(params, occ, win_rows):
        def f(p):
            out = render_rays_train(
                ngp, p, occ, rays_o, rays_d, noise,
                jnp.ones((3,), jnp.float32), rcfg=rcfg, n_samples=S,
                chain_length=chain, win_rows=win_rows)
            return out["rgb"].sum()
        gt = jax.grad(f)(params)["hash_table"]
        return jnp.vdot(gt, gt)
    timeit("render fwd+bwd", render_grad, params, occ, win_rows)

    # 8b. density-grid update (runs every 16 steps; amortized cost)
    import jax.random as jrandom

    def grid_update():
        return system.update_density_grid(
            params, system.grid_state, jrandom.PRNGKey(7),
            system.density_threshold, warmup=False, erode=False
        ).mean_density
    timeit("grid update (every 16 steps)", grid_update, n=5)

    # 9. optimizer update alone
    from ngp_pl_tpu.training.train_step import make_optimizer
    opt = make_optimizer(tcfg)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt_state = opt.init(params)

    @jax.jit
    def opt_step(grads, opt_state, params):
        updates, new_state = opt.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates)
        return new_params["hash_table"].sum()
    timeit("adam update", opt_step, grads, opt_state, params)


if __name__ == "__main__":
    main()
