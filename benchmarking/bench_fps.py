#!/usr/bin/env python
"""Inference FPS benchmark: full-image renders with the device-resident
round renderer on a briefly-trained procedural scene.

Reference headline: 36.2 FPS on Lego at 800x800 on an RTX 2080 Ti
(reference README.md:121, test.ipynb timing loop with explicit sync).

Usage: python benchmarking/bench_fps.py [--size 800] [--frames 5]
Prints one JSON line {"metric": "render_fps", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--train_steps", type=int, default=1536)
    args = ap.parse_args()

    from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
    from ngp_pl_tpu.training.system import NeRFSystem

    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       exp_name="bench_fps", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    nb = tcfg.grid_update_interval
    for i in range(args.train_steps // nb):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    print(f"trained {args.train_steps} steps", file=sys.stderr, flush=True)

    # full-resolution camera on the same scene geometry
    W = H = args.size
    f = 1.2 * W
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = test_ds.poses[0]

    # the reference's headline FPS is measured in test.ipynb at
    # T_threshold=1e-2 (as is the GUI, show_gui.py:86) — not the
    # validation path's 1e-4; build the matching renderer
    from ngp_pl_tpu.models.rendering import make_device_round_renderer
    from ngp_pl_tpu.ops.ray_march import segment_march_dmax_ok

    use_window = segment_march_dmax_ok(dirs, scale=system.cfg.scale)
    chunk = min(131072, 1 << (W * H - 1).bit_length())
    render = make_device_round_renderer(system.ngp, system.rcfg,
                                        use_window=use_window,
                                        t_threshold=1e-2, chunk=chunk)
    out = render.from_pose(system.state.params, system.grid_state.occ_grid,
                           dirs, pose)    # compile + warm
    t0 = time.time()
    for _ in range(args.frames):
        out = render.from_pose(system.state.params,
                               system.grid_state.occ_grid, dirs, pose)
    dt = (time.time() - t0) / args.frames
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "render_fps",
        "value": round(fps, 2),
        "unit": f"frames/s @ {W}x{H}",
        "vs_baseline": round(fps / 36.2, 4),
        "samples_per_ray": round(out["total_samples"] / (W * H), 2),
        "rounds": out.get("rounds"),
        "mean_opacity": round(float(out["opacity"].mean()), 4),
    }))


if __name__ == "__main__":
    main()
