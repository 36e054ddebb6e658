#!/usr/bin/env python
"""Bucket-ladder sweep for the device-round renderer at 800^2.

Each ladder is a fresh while_loop program (one remote compile each); run
once, record, and pin the winner as the default ladder."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
from ngp_pl_tpu.models.rendering import make_device_round_renderer
from ngp_pl_tpu.ops.ray_march import segment_march_dmax_ok
from ngp_pl_tpu.training.system import NeRFSystem


def ladder(chunk, s0=8, ratio=2, first_chain=256, chain=128):
    out = []
    s, ns = chunk, s0
    first = True
    while s >= 1024 and ns <= 64:
        out.append((s, ns, first_chain if first else chain))
        s //= ratio
        ns = min(64, ns * ratio)
        first = False
    tail = (min(max(s, 256), chunk), 64, chain)
    if tail not in out:
        out.append(tail)
    return out


def main():
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="fps_sweep", no_save_test=True)
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
    use_window = segment_march_dmax_ok(dirs, scale=system.cfg.scale)
    params = system.state.params
    occ = system.grid_state.occ_grid
    C = 131072

    configs = {
        "default": None,
        "chain128": ladder(C, first_chain=128, chain=128),
        "chain96": ladder(C, first_chain=128, chain=96),
        "s16": ladder(C, s0=16, first_chain=128),
        "s16_chain96": ladder(C, s0=16, first_chain=96, chain=96),
    }
    for name, b in configs.items():
        render = make_device_round_renderer(
            system.ngp, system.rcfg, use_window=use_window,
            t_threshold=1e-2, buckets=b)
        out = render.from_pose(params, occ, dirs, pose)
        t0 = time.time()
        n = 5
        for _ in range(n):
            out = render.from_pose(params, occ, dirs, pose)
        dt = (time.time() - t0) / n
        print(f"{name:14s} {1.0/dt:6.3f} FPS  {dt*1e3:7.1f} ms "
              f"rounds {out['rounds']:3d} "
              f"s/ray {out['total_samples']/(W*H):5.2f}", flush=True)


if __name__ == "__main__":
    main()
