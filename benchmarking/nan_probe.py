#!/usr/bin/env python
"""Stage-by-stage forward diagnostics for the late-training NaN.

Given a (state, key) pair that produces a non-finite loss, reproduce the
EXACT on-device batch (train_step._device_step_core's RNG chain), then run
the forward one stage at a time — march, hash encode (+first layer), MLP
tail, TruncExp, compositing, loss terms — reporting absmax / NaN / inf
counts per stage, on BOTH field paths:

  - the fused Pallas path (packed-f16 table rows + fused tail), and
  - the plain XLA path (f32 table gathers, bf16 matmuls)

A divergence between the two fingers the Pallas kernels' reduced-precision
arithmetic; a shared blow-up fingers the math itself.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _stat(name, x):
    a = np.asarray(x, np.float64) if hasattr(x, "dtype") else np.asarray(x)
    finite = np.isfinite(a)
    mx = float(np.abs(a[finite]).max()) if finite.any() else float("nan")
    print(f"    {name:32s} absmax {mx:12.4e} "
          f"nan {int(np.isnan(a).sum()):6d} inf {int(np.isinf(a).sum()):6d}",
          flush=True)
    return int((~np.isfinite(a)).sum())


def probe(system, state, key):
    """state/key: the TrainState + system.key JUST BEFORE the failing step."""
    from ngp_pl_tpu.datasets.ray_utils import get_rays
    from ngp_pl_tpu.models.ngp import NGP, _mlp_apply
    from ngp_pl_tpu.models.rendering import (
        composite_train,
        scene_hits,
    )
    from ngp_pl_tpu.ops.hash_encoding import hash_encode_mlp
    from ngp_pl_tpu.ops.ray_march import march_rays_train_window
    from ngp_pl_tpu.ops.sh import sh_encode
    from ngp_pl_tpu.ops.trunc_exp import trunc_exp

    tcfg = system.tcfg
    cfg = system.cfg
    rcfg = system.rcfg
    params = state.params

    # ---- reproduce the batch (train_step._device_step_core RNG chain) ----
    key = jax.random.fold_in(key, state.step)
    k_img, k_pix, key = jax.random.split(key, 3)
    B = tcfg.batch_size
    rays_store = system.rays_device
    n_img, n_pix = rays_store.shape[0], rays_store.shape[1]
    if tcfg.ray_sampling_strategy == "same_image":
        img_idxs = jnp.broadcast_to(
            jax.random.randint(k_img, (1,), 0, n_img), (B,)).astype(jnp.int32)
    else:
        img_idxs = jax.random.randint(k_img, (B,), 0, n_img, dtype=jnp.int32)
    pix_idxs = jax.random.randint(k_pix, (B,), 0, n_pix, dtype=jnp.int32)
    payload = rays_store[img_idxs, pix_idxs]
    rgb_gt = payload[:, :3]
    poses = system.poses[img_idxs]
    dirs = system.directions[pix_idxs]
    rays_o, rays_d = get_rays(dirs, poses)
    k_noise, k_bg = jax.random.split(key)
    noise = jax.random.uniform(k_noise, (B,))

    print("  [probe] params:", flush=True)
    bad = 0
    for pk, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        bad += _stat(jax.tree_util.keystr(pk), leaf)

    # ---- march (windowed, same as the train step) ----
    hits_t = scene_hits(rays_o, rays_d, cfg.scale)
    pool = B * system._pool_mult
    m = march_rays_train_window(
        rays_o, rays_d, hits_t, noise, system.grid_state.win_rows,
        scale=cfg.scale, grid_size=cfg.grid_size,
        max_samples=rcfg.max_samples, pool_size=pool,
        chain_length=system.chain_length)
    print("  [probe] march:", flush=True)
    _stat("ts", m.ts)
    _stat("deltas", m.deltas)
    print(f"    total {int(m.total)} rm_max {int(m.rm_counts.max())}",
          flush=True)

    ridx = jnp.clip(m.ray_idx, 0, B - 1)
    od = jnp.pad(jnp.concatenate([rays_o, rays_d], axis=1),
                 ((0, 0), (0, 2)))[ridx]
    xyz = od[:, 0:3] + m.ts[:, None] * od[:, 3:6]
    dvec = od[:, 3:6]

    for tag, fused in (("pallas", True), ("xla", False)):
        ngp = NGP(cfg, need_x_grad=False)
        ngp.fused_tail = fused and ngp.fused_tail
        print(f"  [probe] field path = {tag} "
              f"(fused_tail={ngp.fused_tail}):", flush=True)
        xn = (xyz + cfg.scale) / (2.0 * cfg.scale)
        h1 = hash_encode_mlp(xn, params["hash_table"],
                             params["sigma_mlp"][0], ngp.spec,
                             need_x_grad=False)
        _stat("h1 (encode+L1)", h1)
        h = _mlp_apply(params["sigma_mlp"][1:], jax.nn.relu(h1), ngp.dtype)
        _stat("sigma logits h[:,0]", h[:, 0])
        sigma_x = trunc_exp(h[:, 0])
        _stat("sigma (xla stack)", sigma_x)
        sigmas, rgbs = ngp.forward(params, xyz, dvec)
        _stat("sigma (full fwd)", sigmas)
        _stat("rgb (full fwd)", rgbs)
        out = composite_train(
            sigmas, rgbs, m.deltas, m.ts, m.ray_idx, m.valid, m.offsets,
            n_rays=B, T_threshold=rcfg.t_threshold)
        _stat("opacity", out["opacity"])
        _stat("rgb composited", out["rgb"])
        _stat("depth", out["depth"])
        bg = jnp.ones((3,), jnp.float32)
        rgb_full = out["rgb"] + bg[None, :] * (1.0 - out["opacity"][:, None])
        mse = ((rgb_full - rgb_gt) ** 2).mean()
        o = out["opacity"]
        oc = jnp.clip(o, 1e-10, 1.0 - 1e-10)
        _stat("mse", mse)
        _stat("opacity-entropy", -oc * jnp.log(oc))
        # gradient probe: which param leaf's grad blows up first
        def loss_fn(p):
            s2, r2 = NGP(cfg, need_x_grad=False).forward(p, xyz, dvec)
            o2 = composite_train(
                s2, r2, m.deltas, m.ts, m.ray_idx, m.valid, m.offsets,
                n_rays=B, T_threshold=rcfg.t_threshold)
            rf = o2["rgb"] + bg[None, :] * (1.0 - o2["opacity"][:, None])
            l = ((rf - rgb_gt) ** 2).mean()
            occ = jnp.clip(o2["opacity"], 1e-10, 1.0 - 1e-10)
            return l + tcfg.opacity_loss_w * (-occ * jnp.log(occ)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        _stat("loss", loss)
        for pk, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            _stat("grad" + jax.tree_util.keystr(pk), leaf)
