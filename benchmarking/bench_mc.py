#!/usr/bin/env python
"""Multi-cascade (scale=4, exp-stepping) train bench + quality gate.

The reference's unbounded-scene recipes (benchmark_mipnerf360.sh,
benchmark_tanks_and_temples.sh: scale 4-64, exp_step_factor=1/256) exercise
the multi-mip occupancy march (raymarching.cu:19-32).  This bench trains the
procedural scene geometrically scaled to world_scale=4 (content spans
[-1.6, 1.6]^3 across 4 cascades) and reports steady-state rays/s + PSNR,
A/B-ing the windowed mc march against the per-step z-line fallback.

  python benchmarking/bench_mc.py --steps 2048            # windowed (default)
  python benchmarking/bench_mc.py --steps 2048 --no_window
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
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--no_window", action="store_true",
                    help="force the per-step z-line march (A/B baseline)")
    ap.add_argument("--img_size", type=int, default=96)
    args = ap.parse_args()

    from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.training.system import NeRFSystem

    steps = args.steps
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       num_epochs=max(1, steps // 1000),
                       iters_per_epoch=1000,
                       exp_name="bench_mc", no_save_test=True,
                       scale=args.scale)
    ws = args.scale / 0.5          # content fills the box like the ws=1 scene
    # exp-stepping training composites on BLACK background (reference
    # real-scene convention, rendering.py:153-161) — GT must match
    train_ds = SyntheticDataset(split="train", img_size=args.img_size,
                                n_train=8, world_scale=ws, bg=0.0)
    test_ds = SyntheticDataset(split="test", img_size=args.img_size,
                               n_test=2, world_scale=ws, bg=0.0)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    print(f"cascades {system.cfg.cascades} exp_step_factor "
          f"{system.cfg.exp_step_factor} window_march {system.window_march} "
          f"chain_full {system.chain_full}", flush=True)
    if args.no_window:
        system.window_march = False
    system.on_train_start()
    nb = tcfg.grid_update_interval
    assert steps % nb == 0 and system.rays_device is not None

    t0 = time.time()
    for i in range(steps // nb):
        m = system.step_block()
        if ((i + 1) * nb) % 512 == 0:
            print(f"  {(i+1)*nb}/{steps} loss "
                  f"{float(np.asarray(m['loss'])):.4f} "
                  f"rm_s {float(np.asarray(m['rm_samples']))/8192:6.1f} "
                  f"S {system._pool_mult} {system.layout} "
                  f"chain {system.chain_length} t {time.time()-t0:6.1f}s",
                  flush=True)
    float(np.asarray(m["loss"]))

    system.freeze_buckets = True
    t0 = time.time()
    for _ in range(64 // nb):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    rps = 8192 * 64 / (time.time() - t0)
    scores = system.validate(save_images=False)
    tag = "zline" if args.no_window else "window"
    rec = {"tag": f"mc_{tag}", "scale": args.scale, "steps": steps,
           "cascades": system.cfg.cascades,
           "rays_per_s": round(rps),
           "psnr": round(scores.get("psnr", float("nan")), 3),
           "ssim": round(scores.get("ssim", float("nan")), 4),
           "layout": system.layout, "pool_mult": system._pool_mult,
           "chain": system.chain_length}
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"bench_mc_{tag}.json")
    with open(out, "w") as f:
        json.dump(rec, f)


if __name__ == "__main__":
    main()
