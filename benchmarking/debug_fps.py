#!/usr/bin/env python
"""Instrumented host-loop replica of the device-round renderer: per-round
timing (bucket, alive, march/field split) for one 800^2 frame with the
span-culled ray set.  FPS_NO_FIELD=1 replaces the field eval with
constants to isolate march+scheduling cost."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
from ngp_pl_tpu.training.system import NeRFSystem

NO_FIELD = bool(os.environ.get("FPS_NO_FIELD"))


def main():
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="dbg_fps", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    for i in range(1536 // 16):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    print("trained", file=sys.stderr, flush=True)

    W = H = 800
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]
    rays_d_all = np.asarray(dirs @ pose[:, :3].T, np.float32)
    rays_o_all = np.asarray(
        np.broadcast_to(pose[:, 3], rays_d_all.shape), np.float32)

    from ngp_pl_tpu.models.rendering import SQRT3, scene_hits
    from ngp_pl_tpu.ops.ray_march import (
        march_rays_test_round,
        occupancy_windows,
        occupied_span,
    )
    from ngp_pl_tpu.ops.volume_render import composite_test_round

    cfg, rcfg = system.cfg, system.rcfg
    params = system.state.params
    occ_grid = system.grid_state.occ_grid
    win_rows = occupancy_windows(occ_grid)
    ngp = system.ngp
    thr = 1e-2

    # frame-level span pass + compaction (renderer render_image)
    @jax.jit
    def span_pass(ro, rd):
        hits = scene_hits(ro, rd, cfg.scale)
        t1s, t2s, steps = occupied_span(
            ro, rd, hits[:, 0], hits[:, 1], occ_grid, scale=cfg.scale,
            grid_size=cfg.grid_size, dt_min=float(SQRT3) / rcfg.max_samples)
        return t1s, t2s, (hits[:, 0] >= 0) & (steps > 0)

    t0 = time.time()
    t1s, t2s, alive0 = span_pass(jnp.asarray(rays_o_all),
                                 jnp.asarray(rays_d_all))
    alive0 = np.asarray(alive0)
    t_span = time.time() - t0
    idx0 = np.nonzero(alive0)[0]
    print(f"span pass {t_span*1e3:.1f} ms; alive {len(idx0)}/{W*H} "
          f"({len(idx0)/(W*H):.1%})", flush=True)

    # the current 2x ladder (rendering.py make_device_round_renderer)
    chunk = 65536
    buckets = []
    s, ns = chunk, 8
    first = True
    while s >= 1024 and ns <= 64:
        buckets.append((s, ns, 256 if first else 128))
        s //= 2
        ns = min(64, ns * 2)
        first = False
    tail = (min(max(s, 256), chunk), 64, 128)
    if tail not in buckets:
        buckets.append(tail)
    print("buckets:", buckets, flush=True)

    @functools.partial(jax.jit, static_argnames=("n_s", "chain"))
    def one_round(params, ro_i, rd_i, tc, te, opa, dep, rg, *, n_s, chain):
        ts, dts, valid, t_next, n_eff = march_rays_test_round(
            ro_i, rd_i, tc, te, occ_grid, cascades=cfg.cascades,
            scale=cfg.scale, exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
            n_samples=n_s, chain_length=chain, win_rows=win_rows)
        S, NS = ts.shape
        if NO_FIELD:
            sig = jnp.full((S, NS), 10.0)
            rgbs = jnp.full((S, NS, 3), 0.5)
        else:
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

    # process the compacted alive set chunk by chunk with a host round loop
    N_all = len(idx0)
    t_total = 0.0
    stats = {}
    rounds_total = 0
    for c0 in range(0, N_all, chunk):
        sel = idx0[c0:c0 + chunk]
        n = len(sel)
        ro = rays_o_all[sel]
        rd = rays_d_all[sel]
        t_cur = np.asarray(t1s)[sel].copy()
        te_np = np.asarray(t2s)[sel]
        opacity = np.zeros(n, np.float32)
        depth = np.zeros(n, np.float32)
        rgb = np.zeros((n, 3), np.float32)
        alive = np.ones(n, bool)
        rounds = 0
        while alive.any() and rounds < 512:
            n_alive = int(alive.sum())
            bi = 0
            for i in range(len(buckets)):        # smallest covering bucket
                if buckets[i][0] >= n_alive:
                    bi = i
            slots, n_s, chain = buckets[bi]
            chain = -(-max(chain, 4 * n_s) // 8) * 8
            idx_np = np.nonzero(alive)[0][:slots]
            pad = slots - len(idx_np)
            real = len(idx_np)
            if pad > 0:
                idx_np = np.pad(idx_np, (0, pad), constant_values=idx_np[0])
            pad_mask = np.arange(slots) < real
            t0 = time.time()
            o2, d2, r2, a2, t_next, n_valid, n_eff = one_round(
                params, jnp.asarray(ro[idx_np]), jnp.asarray(rd[idx_np]),
                jnp.asarray(t_cur[idx_np]), jnp.asarray(te_np[idx_np]),
                jnp.asarray(opacity[idx_np]), jnp.asarray(depth[idx_np]),
                jnp.asarray(rgb[idx_np]), n_s=n_s, chain=chain)
            a2 = np.asarray(a2)
            dt = time.time() - t0
            t_total += dt
            t_cur[idx_np[:real]] = np.asarray(t_next)[:real]
            opacity[idx_np[:real]] = np.asarray(o2)[:real]
            depth[idx_np[:real]] = np.asarray(d2)[:real]
            rgb[idx_np[:real]] = np.asarray(r2)[:real]
            alive[idx_np[:real]] = a2[:real]
            st = stats.setdefault((slots, n_s), [0, 0.0, 0, 0, 0])
            st[0] += 1
            st[1] += dt
            st[2] += int(np.asarray(n_valid))
            st[3] += int(np.asarray(n_eff))
            st[4] += n_alive
            rounds += 1
        rounds_total += rounds

    tag = "march-only" if NO_FIELD else "full"
    print(f"[{tag}] rounds {rounds_total} loop {t_total:.2f}s "
          f"(+span {t_span:.2f}s; host-loop dispatch inflates vs the fused "
          f"while_loop)", flush=True)
    for (slots, n_s), (cnt, t, nv, ne, na) in sorted(stats.items()):
        print(f"  bucket ({slots:6d} x {n_s:2d}): {cnt:4d} rounds "
              f"{t:7.2f}s  slot-samples {cnt*slots*n_s/1e6:7.1f}M "
              f"valid {nv/1e6:7.1f}M marched {ne/1e6:7.1f}M "
              f"avg-alive {na//max(cnt,1):6d}", flush=True)


if __name__ == "__main__":
    main()
