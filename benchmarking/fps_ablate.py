#!/usr/bin/env python
"""Fused-renderer cost split: full frame vs const-field (march+schedule
only) vs span-pass alone, at 800^2 on the trained procedural scene."""
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


def main():
    steps = int(os.environ.get("FPS_TRAIN_STEPS", 1536))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="fps_ablate", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    for i in range(steps // 16):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    print(f"trained {steps}", file=sys.stderr, flush=True)

    W = H = int(os.environ.get("FPS_SIZE", 800))
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]
    rays_d = np.asarray(dirs @ pose[:, :3].T, np.float32)
    rays_o = np.asarray(np.broadcast_to(pose[:, 3], rays_d.shape),
                        np.float32)
    use_window = segment_march_dmax_ok(dirs, scale=system.cfg.scale)
    params = system.state.params
    occ = system.grid_state.occ_grid

    def bench(tag, render):
        out = render(params, occ, rays_o, rays_d)       # compile+warm
        t0 = time.time()
        n = 4
        for _ in range(n):
            out = render(params, occ, rays_o, rays_d)
        dt = (time.time() - t0) / n
        print(f"{tag:14s} {dt*1e3:8.1f} ms/frame  "
              f"samples/ray {out['total_samples']/(W*H):6.2f} "
              f"rounds {out.get('rounds')} "
              f"alive {out.get('alive_rays')}", flush=True)
        return dt

    full = bench("full", make_device_round_renderer(
        system.ngp, system.rcfg, use_window=use_window, t_threshold=1e-2))
    nofield = bench("const-field", make_device_round_renderer(
        system.ngp, system.rcfg, use_window=use_window, t_threshold=1e-2,
        debug_const_field=True))
    print(f"field share ~= {(full-nofield)/full:.1%} "
          f"({(full-nofield)*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
