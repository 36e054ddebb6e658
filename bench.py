#!/usr/bin/env python
"""Benchmark: steady-state training throughput (rays/s) on the flagship
Lego-class config (full NGP: T=2^19 L=16 hash table, batch 8192 rays,
scale 0.5, occupancy-guided marching on the procedural synthetic scene).

Baseline: the reference trains Lego 30k steps x 8192 rays in ~5 min on an
RTX 2080 Ti (reference README.md:71,122; BASELINE.md) ~= 1.0e6 rays/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
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

    steps_meas = 100

    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       num_epochs=30, exp_name="bench", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()

    # pre-sample batches so host sampling is off the measured path
    batches = [system.sample_batch() for _ in range(16)]

    # skip grid warmup shapes: jump straight to the steady-state cadence
    # (warmup uses a separate jitted update variant; compile both once)
    system.step(batches[0])                       # step 0: warmup update
    system.state = system.state._replace(
        step=system.state.step * 0 + tcfg.grid_warmup_steps + 16)
    for i in range(3):                            # steady-state compiles
        system.step(batches[i % len(batches)])
    jax.block_until_ready(system.state.params)

    t0 = time.time()
    for i in range(steps_meas):
        system.step(batches[i % len(batches)])
    jax.block_until_ready(system.state.params)
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
