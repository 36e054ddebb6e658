#!/usr/bin/env python
"""Trace the demand/layout controller interval by interval at bench shapes."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def main():
    B = int(os.environ.get("PROF_BATCH", 8192))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=B,
                       num_epochs=30, exp_name="diag2", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    warm = int(os.environ.get("PROF_WARM", 768))
    nb = tcfg.grid_update_interval
    for i in range(warm // nb):
        m = system.step_block()
        dv = system._pending_demand
        if dv is None:
            continue
        (rm, cmax, cq, rm_q, vr_q, vr_q90, vr_mean, alive,
         rm_mean_pre) = (float(v) for v in np.asarray(dv))
        print(f"blk {i:3d} layout {system.layout:8s} S {system._pool_mult:3d}"
              f" chain {system.chain_length:5d} pd {system._pool_demand:6.1f}"
              f" | rm_mean {rm / B:5.1f} rm_q99 {rm_q:6.1f}"
              f" vr_q99 {vr_q:6.1f} vr_mean {vr_mean:5.1f}"
              f" rm_pre {rm_mean_pre:5.1f}"
              f" chain_q {cq:6.0f}", flush=True)


if __name__ == "__main__":
    main()
