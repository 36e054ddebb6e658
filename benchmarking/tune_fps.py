#!/usr/bin/env python
"""A/B bucket schedules for the device-round renderer at 800^2.

First run trains 1536 steps and saves a slim checkpoint next to this file
(reused on subsequent runs), then times one 65536-ray chunk and the full
frame for each candidate schedule."""
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

from ngp_pl_tpu.config import RenderConfig, TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
from ngp_pl_tpu.training import checkpoint as ckpt
from ngp_pl_tpu.training.system import NeRFSystem

CKPT = os.path.join(os.path.dirname(__file__), "_tune_fps_slim.npz")


def main():
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="tune_fps", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    if os.path.exists(CKPT):
        params, grid = ckpt.load_slim_checkpoint(
            CKPT, params=system.state.params)
        system.state = system.state._replace(params=params)
        from ngp_pl_tpu.models.occupancy import grid_rows

        occ = jnp.asarray(grid)
        occ_rows, dil_rows, win_rows = grid_rows(
            occ, system.cfg.cascades, system.cfg.grid_size)
        system.grid_state = system.grid_state._replace(
            occ_grid=occ, occ_rows=occ_rows, dil_rows=dil_rows,
            win_rows=win_rows)
        print("loaded checkpoint", file=sys.stderr, flush=True)
    else:
        system.on_train_start()
        for i in range(1536 // 16):
            m = system.step_block()
        float(np.asarray(m["loss"]))
        system.save_slim(CKPT)
        print("trained + saved", file=sys.stderr, flush=True)

    W = H = 800
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]
    rays_d = (dirs @ pose[:, :3].T).astype(np.float32)
    rays_o = np.broadcast_to(pose[:, 3], rays_d.shape).astype(np.float32)

    from ngp_pl_tpu.models.rendering import make_device_round_renderer
    from ngp_pl_tpu.ops.ray_march import segment_march_dmax_ok

    use_window = segment_march_dmax_ok(dirs, scale=system.cfg.scale)
    print(f"window {use_window}", file=sys.stderr, flush=True)

    cands = {
        "default(4x,S4)": None,
        "2x ladder S8": [(65536, 8, 256), (32768, 16, 128), (16384, 16, 128),
                         (8192, 32, 128), (4096, 64, 128), (2048, 64, 128),
                         (1024, 64, 128), (512, 64, 128)],
        "2x ladder S16": [(65536, 16, 256), (32768, 16, 128),
                          (16384, 32, 128), (8192, 32, 128),
                          (4096, 64, 128), (2048, 64, 128), (1024, 64, 128),
                          (512, 64, 128)],
        "flat S32": [(65536, 32, 256), (32768, 32, 128), (16384, 32, 128),
                     (8192, 32, 128), (4096, 32, 128), (1024, 64, 128)],
    }
    name = os.environ.get("ONLY")
    for cname, buckets in cands.items():
        if name and name != cname:
            continue
        render = make_device_round_renderer(
            system.ngp, system.rcfg, use_window=use_window,
            t_threshold=1e-2, buckets=buckets)
        out = render(system.state.params, system.grid_state.occ_grid,
                     rays_o, rays_d)      # compile + warm
        t0 = time.time()
        out = render(system.state.params, system.grid_state.occ_grid,
                     rays_o, rays_d)
        dt = time.time() - t0
        print(f"{cname:18s} {dt*1e3:8.0f} ms/frame  {1.0/dt:6.2f} fps  "
              f"rounds {out['rounds']} samples/ray "
              f"{out['total_samples']/len(rays_o):.1f}", flush=True)


def main_oneshot():
    """Time the upgraded one-shot CSR test renderer on the same frame."""
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="tune_fps", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    params, grid = ckpt.load_slim_checkpoint(CKPT, params=system.state.params)
    occ = jnp.asarray(grid)

    W = H = 800
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]
    rays_d = (dirs @ pose[:, :3].T).astype(np.float32)
    rays_o = np.broadcast_to(pose[:, 3], rays_d.shape).astype(np.float32)

    from ngp_pl_tpu.models.rendering import make_test_renderer
    from ngp_pl_tpu.ops.ray_march import segment_march_dmax_ok

    use_window = bool(segment_march_dmax_ok(dirs, scale=system.cfg.scale))
    for chunk, pm, chain in ((16384, 32, 1152), (32768, 32, 1152),
                             (16384, 48, 1152), (32768, 32, 896)):
        render = make_test_renderer(system.ngp, system.rcfg, chunk=chunk,
                                    pool_mult=pm, use_window=use_window,
                                    chain_length=chain, t_threshold=1e-2)
        out = render(params, occ, rays_o, rays_d)
        t0 = time.time()
        out = render(params, occ, rays_o, rays_d)
        dt = time.time() - t0
        print(f"one-shot csr chunk {chunk} x{pm} chain {chain}: "
              f"{dt*1e3:7.0f} ms/frame {1.0/dt:6.2f} fps "
              f"samples/ray {out['total_samples']/len(rays_o):.1f}",
              flush=True)


if __name__ == "__main__":
    if os.environ.get("ONESHOT"):
        main_oneshot()
    else:
        main()
