#!/usr/bin/env python
"""Benchmark: steady-state training throughput (rays/s) on the flagship
Lego-class config (full NGP: T=2^19 L=16 hash table, batch 8192 rays,
scale 0.5, occupancy-guided marching on the procedural synthetic scene).

Regime: the reference's headline (Lego 30k steps x 8192 rays in ~5 min on an
RTX 2080 Ti ~= 1.0e6 rays/s, reference README.md:71,122; BASELINE.md) is
dominated by the post-warmup phase where the occupancy grid has converged to
the scene's real ~5-10% occupancy.  The bench therefore trains through the
warmup + convergence phase first (occupancy, pool buckets, and lr schedule
reach steady state), then times steps in that regime.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 1.0e6


def main():
    from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.training.system import NeRFSystem

    batch_size = int(os.environ.get("BENCH_BATCH", 8192))
    # warm until the occupancy grid / budgets approach the converged regime
    # the reference spends ~95% of its 30k-step budget in (grid EMA needs
    # O(1k) steps to prune; demand plateaus by ~step 1000 on this scene)
    # 2048: demand is still declining at 1024 (grid EMA keeps pruning);
    # by ~2k steps the budget reaches the x32 bucket the 6k-step run holds,
    # i.e. the regime the reference's 30k-step budget actually lives in
    steps_warm = int(os.environ.get("BENCH_WARM_STEPS", 2048))
    steps_meas = int(os.environ.get("BENCH_STEPS", 192))
    # BENCH_SCALE > 0.5 exercises the multi-cascade / exponential-stepping
    # real-scene path (reference benchmark_mipnerf360.sh regime)
    scale = float(os.environ.get("BENCH_SCALE", 0.5))

    tcfg = TrainConfig(dataset_name="synthetic", batch_size=batch_size,
                       scale=scale,
                       num_epochs=30, exp_name="bench", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()

    # device-resident rays: sampling happens inside the jitted step, so the
    # measured loop does zero host->device data movement
    assert system.rays_device is not None

    # NOTE: on remote-tunnel backends `jax.block_until_ready` may be a
    # no-op; a host transfer of a scalar is the reliable completion fence.
    def fence(metrics):
        return float(np.asarray(metrics["loss"]))

    # converge occupancy / pool & chain buckets / lr into the steady state
    # the reference spends ~95% of its training budget in.  Steps run as
    # scanned 16-step blocks (one device dispatch per grid-update interval).
    nb = tcfg.grid_update_interval
    t_w = time.time()
    for i in range(steps_warm // nb):
        m = system.step_block()
        if (i + 1) % 4 == 0:
            fence(m)
            print(f"warm {(i+1)*nb}/{steps_warm} "
                  f"{(time.time()-t_w)/(4*nb)*1e3:.0f}ms/step"
                  f" {system.layout} x{system._pool_mult}"
                  f" chain {system.chain_length}",
                  file=sys.stderr, flush=True)
            t_w = time.time()
    fence(m)

    # pin the jit variants: a demand blip flipping a pool/chain bucket would
    # otherwise compile a fresh XLA program inside the timed window
    system.freeze_buckets = True
    m = system.step_block()
    fence(m)

    # at least one block: BENCH_STEPS below the block size would otherwise
    # truncate to zero measured steps (divide-by-zero window)
    steps_meas = max(nb, (steps_meas // nb) * nb)
    t0 = time.time()
    for i in range(steps_meas // nb):
        m = system.step_block()
    fence(m)
    dt = time.time() - t0

    rays_per_s = tcfg.batch_size * steps_meas / dt
    print(json.dumps({
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
