#!/usr/bin/env python
"""Quality + speed A/B of hash-table geometries on the procedural scene.

(L=16, F=2): the reference tinycudann geometry (networks.py:32-56).
(L=8, F=4):  equal-parameter TPU variant (512-byte tile rows, half the
             gather/scatter row count).

Trains each for --steps, reports steady rays/s and test PSNR/SSIM.
"""
from __future__ import annotations

import argparse
import sys
import time


def run(tag, n_levels, n_features, steps):
    import jax
    import numpy as np

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.training.system import NeRFSystem

    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       num_epochs=max(1, steps // 1000),
                       iters_per_epoch=1000,
                       exp_name=f"ablate_{tag}", no_save_test=True,
                       n_levels=n_levels, n_features=n_features)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=2)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    nb = tcfg.grid_update_interval
    if system.rays_device is not None and steps % nb == 0:
        # scanned 16-step blocks: one dispatch per grid interval (the
        # per-step host loop pays ~20 ms of dispatch each through the
        # remote tunnel — 2x wall time at 30k steps)
        for i in range(steps // nb):
            m = system.step_block()
            if ((i + 1) * nb) % 256 == 0:
                print(f"  {tag} {(i+1)*nb}/{steps} loss "
                      f"{float(np.asarray(m['loss'])):.4f}",
                      file=sys.stderr, flush=True)
    else:
        for i in range(steps):
            m = system.step()
            if (i + 1) % 256 == 0:
                print(f"  {tag} {i+1}/{steps} loss "
                      f"{float(np.asarray(m['loss'])):.4f}",
                      file=sys.stderr, flush=True)
    float(np.asarray(m["loss"]))
    system.freeze_buckets = True
    t0 = time.time()
    if system.rays_device is not None and system._host_step % nb == 0:
        for i in range(64 // nb):
            m = system.step_block()
    else:
        for i in range(64):
            m = system.step()
    float(np.asarray(m["loss"]))
    rps = 8192 * 64 / (time.time() - t0)
    scores = system.validate(save_images=False)
    print(f"{tag}: rays/s {rps:.0f}  psnr {scores.get('psnr', float('nan')):.2f}"
          f"  ssim {scores.get('ssim', float('nan')):.4f}"
          f"  layout {system.layout} x{system._pool_mult}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1536)
    ap.add_argument("--only", type=str, default="",
                    help="run a single geometry: L16F2 or L8F4")
    args = ap.parse_args()
    from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if args.only != "L8F4":
        run("L16F2", 16, 2, args.steps)
    if args.only != "L16F2":
        run("L8F4", 8, 4, args.steps)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
