#!/usr/bin/env python
"""Full-budget training run on the procedural scene with skip telemetry.

The reference's acceptance record is 30k steps -> 35.76 PSNR Lego in ~5 min
(/root/reference/README.md:71,118-122).  This harness runs the same step
budget end-to-end with the GradScaler-parity non-finite grad-skip active,
COUNTS the skipped steps (a skip-storm would be a silent training stall),
reports wall time, and scores the test split at the end.

  python benchmarking/full_run.py --steps 30000 --geometry L8F4
  python benchmarking/full_run.py --steps 30000 --ceiling   # quality-ceiling
      anchor: oversized L16F4 + 2^20 table, establishes the scene's
      practical PSNR ceiling for the regression gate (VERDICT r4 #8)

Writes a JSON line to benchmarking/full_run_<tag>.json.
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
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--geometry", type=str, default="L8F4",
                    choices=["L8F4", "L16F2"])
    ap.add_argument("--ceiling", action="store_true",
                    help="oversized config (L16F4, 2^20 table) to anchor "
                         "the scene's practical PSNR ceiling")
    ap.add_argument("--img_size", type=int, default=96)
    ap.add_argument("--n_train", type=int, default=8,
                    help="training views; the reference's Lego protocol has "
                         "100 — at 8 views a 30k budget is deep overfit "
                         "(every pixel seen ~3000x) and test PSNR degrades "
                         "late even though training is perfectly stable")
    ap.add_argument("--tag", type=str, default="")
    args = ap.parse_args()

    from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.training.system import NeRFSystem

    if args.ceiling:
        n_levels, n_features, log2_t = 16, 4, 20
        tag = args.tag or "ceiling"
    elif args.geometry == "L16F2":
        n_levels, n_features, log2_t = 16, 2, 19
        tag = args.tag or "L16F2"
    else:
        n_levels, n_features, log2_t = 8, 4, 19
        tag = args.tag or "L8F4"

    steps = args.steps
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       num_epochs=max(1, steps // 1000),
                       iters_per_epoch=1000,
                       exp_name=f"full_run_{tag}", no_save_test=True,
                       n_levels=n_levels, n_features=n_features,
                       log2_hashmap_size=log2_t)
    train_ds = SyntheticDataset(split="train", img_size=args.img_size,
                                n_train=args.n_train)
    test_ds = SyntheticDataset(split="test", img_size=args.img_size,
                               n_test=2)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    nb = tcfg.grid_update_interval
    assert steps % nb == 0 and system.rays_device is not None

    # stall insurance: the remote tunnel can deadlock mid-run (see
    # .claude/skills/verify: "tunnel stall mode"); checkpoint every 4096
    # steps so a kill+restart resumes instead of retraining from zero
    ck = os.path.join("ckpts", "synthetic", f"full_run_{tag}", "resume.npz")
    start_step = 0
    if os.path.exists(ck):
        system.load(ck)
        start_step = system._host_step
        print(f"resuming from {ck} at step {start_step}", flush=True)

    # exact skip accounting with zero pipeline stalls: keep each block's
    # device scalar and sum after training (one sync at the end)
    skip_counters = []
    t0 = time.time()
    for i in range(start_step // nb, steps // nb):
        m = system.step_block()
        skip_counters.append(m["n_skipped"])
        step_now = (i + 1) * nb
        if step_now % 2048 == 0 and step_now < steps:
            os.makedirs(os.path.dirname(ck), exist_ok=True)
            system.save(ck)
        if step_now % 1024 == 0 or step_now == steps:
            loss = float(np.asarray(m["loss"]))
            tbl = np.asarray(system.state.params["hash_table"])
            print(f"step {step_now:6d} loss {loss:.5f} "
                  f"rm_s {float(np.asarray(m['rm_samples']))/8192:6.1f} "
                  f"tbl_absmax {float(np.abs(tbl).max()):9.3f} "
                  f"S {system._pool_mult} {system.layout} "
                  f"t {time.time()-t0:7.1f}s", flush=True)
            if not np.isfinite(loss):
                print("*** non-finite loss — aborting run", flush=True)
                break
    wall = time.time() - t0
    steps_run = steps - start_step
    n_skipped_total = int(sum(int(np.asarray(c)) for c in skip_counters))
    print(f"skipped steps (non-finite grads): {n_skipped_total}", flush=True)
    print(f"training done: {steps_run} steps in {wall:.1f}s "
          f"({8192*steps_run/wall:.0f} rays/s incl. compile)", flush=True)

    scores = system.validate(save_images=False)
    rec = {
        "tag": tag, "steps": steps,
        "geometry": f"L{n_levels}F{n_features}T{log2_t}",
        "wall_s": round(wall, 1),
        "steps_run": steps_run,
        "rays_per_s_incl_compile": round(8192 * steps_run / wall),
        "psnr": round(scores.get("psnr", float("nan")), 3),
        "ssim": round(scores.get("ssim", float("nan")), 4),
        "n_skipped": n_skipped_total,
        "final_loss_finite": bool(np.isfinite(loss)),
    }
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"full_run_{tag}.json")
    with open(out, "w") as f:
        json.dump(rec, f)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
