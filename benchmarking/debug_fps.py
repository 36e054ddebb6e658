#!/usr/bin/env python
"""Instrument the device-round renderer: replicate its bucket loop on the
host with per-round timing (bucket, alive count, march/field split) for one
800^2-image chunk, to find where the 7.7 s/frame goes."""
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

from ngp_pl_tpu.config import TrainConfig, RenderConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
from ngp_pl_tpu.training.system import NeRFSystem


def main():
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="dbg_fps", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    for i in range(768 // 16):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    print("trained", file=sys.stderr, flush=True)

    W = H = 800
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]
    rays_d = jnp.asarray(dirs @ pose[:, :3].T, jnp.float32)
    rays_o = jnp.asarray(
        np.broadcast_to(pose[:, 3], rays_d.shape), jnp.float32)

    from ngp_pl_tpu.models.rendering import scene_hits
    from ngp_pl_tpu.ops.ray_march import (
        march_rays_test_round, occupancy_windows, segment_march_dmax_ok)
    from ngp_pl_tpu.ops.volume_render import composite_test_round

    cfg, rcfg = system.cfg, system.rcfg
    params = system.state.params
    occ_grid = system.grid_state.occ_grid
    win_rows = occupancy_windows(occ_grid)
    ngp = system.ngp
    chunk = 65536
    ro = rays_o[:chunk]
    rd = rays_d[:chunk]
    hits = scene_hits(ro, rd, cfg.scale)
    t_end = hits[:, 1]
    thr = 1e-2

    # the renderer's bucket table (rendering.py make_device_round_renderer)
    buckets = []
    s, ns = chunk, 4
    first = True
    while s >= 1024 and ns <= 64:
        buckets.append((s, ns, 256 if first else 128))
        s //= 4
        ns = min(64, ns * 4)
        first = False
    tail = (min(max(s, 256), chunk), 64, 128)
    if tail not in buckets:
        buckets.append(tail)
    print("buckets:", buckets, file=sys.stderr, flush=True)

    N = chunk
    t_cur = np.asarray(hits[:, 0]).copy()
    opacity = np.zeros(N, np.float32)
    depth = np.zeros(N, np.float32)
    rgb = np.zeros((N, 3), np.float32)
    alive = np.asarray(hits[:, 0] >= 0).copy()
    samples = np.zeros(N, np.int32)
    te_np = np.asarray(t_end)

    @jax.jit
    def round_fn(idx, t_cur_d, opa_d, dep_d, rgb_d, n_s, chain):
        # recompiles per (slots, n_s, chain) — host loop passes static via
        # closure below
        pass

    import functools

    @functools.partial(jax.jit, static_argnames=("n_s", "chain"))
    def one_round(params, idxs, tc, te, opa, dep, rg, *, n_s, chain):
        ro_i = ro[idxs]
        rd_i = rd[idxs]
        ts, dts, valid, t_next, n_eff = march_rays_test_round(
            ro_i, rd_i, tc, te, occ_grid, cascades=cfg.cascades,
            scale=cfg.scale, exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
            n_samples=n_s, chain_length=chain, win_rows=win_rows)
        S, NS = ts.shape
        xyz = ro_i[:, None, :] + ts[..., None] * rd_i[:, None, :]
        dirs_i = jnp.broadcast_to(rd_i[:, None, :], (S, NS, 3))
        sig, rgbs = ngp.forward(params, xyz.reshape(S * NS, 3),
                                dirs_i.reshape(S * NS, 3))
        sig = sig.reshape(S, NS)
        rgbs = rgbs.reshape(S, NS, 3)
        a = jnp.ones((S,), bool)
        o2, d2, r2, a2 = composite_test_round(
            sig, rgbs, dts, ts, valid, opa, dep, rg, a, thr)
        a2 = a2 & (t_next < te)
        return o2, d2, r2, a2, t_next, valid.sum(), n_eff.sum()

    rounds = 0
    t_total = 0.0
    stats = {}
    while alive.any() and rounds < 512:
        n_alive = int(alive.sum())
        bi = 0
        for i, (s, _, _) in enumerate(buckets):
            if s >= n_alive:
                bi = i
        slots, n_s, chain = buckets[bi]
        chain = -(-max(chain, 4 * n_s) // 8) * 8
        idx_np = np.nonzero(alive)[0]
        pad = slots - len(idx_np)
        if pad > 0:
            idx_np = np.pad(idx_np, (0, pad), constant_values=idx_np[0])
        else:
            idx_np = idx_np[:slots]      # shouldn't happen (bucket fits)
        idxs = jnp.asarray(idx_np)
        t0 = time.time()
        o2, d2, r2, a2, t_next, n_valid, n_eff = one_round(
            params, idxs, jnp.asarray(t_cur[idx_np]),
            jnp.asarray(te_np[idx_np]), jnp.asarray(opacity[idx_np]),
            jnp.asarray(depth[idx_np]), jnp.asarray(rgb[idx_np]),
            n_s=n_s, chain=chain)
        a2 = np.asarray(a2)
        dt = time.time() - t0
        t_total += dt
        real = len(np.nonzero(alive)[0][:slots])
        t_cur[idx_np[:real]] = np.asarray(t_next)[:real]
        opacity[idx_np[:real]] = np.asarray(o2)[:real]
        depth[idx_np[:real]] = np.asarray(d2)[:real]
        rgb[idx_np[:real]] = np.asarray(r2)[:real]
        alive[idx_np[:real]] = a2[:real]
        key = (slots, n_s)
        st = stats.setdefault(key, [0, 0.0, 0, 0])
        st[0] += 1
        st[1] += dt
        st[2] += int(n_valid)
        st[3] += int(n_eff)
        rounds += 1

    print(f"rounds {rounds} total {t_total:.2f}s  (per-dispatch host loop; "
          f"the fused while_loop avoids the host syncs)", flush=True)
    for (slots, n_s), (cnt, t, nv, ne) in sorted(stats.items()):
        print(f"  bucket ({slots:6d} x {n_s:2d}): {cnt:4d} rounds "
              f"{t:7.2f}s  valid samples {nv/1e6:7.2f}M "
              f"marched {ne/1e6:7.2f}M", flush=True)


if __name__ == "__main__":
    main()
