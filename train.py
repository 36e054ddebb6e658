#!/usr/bin/env python
"""Training CLI (reference train.py __main__, opt.py flag surface).

Examples:
    python train.py --root_dir /data/Synthetic_NeRF/Lego --exp_name Lego
    python train.py --root_dir '' --dataset_name synthetic --num_epochs 2
"""
from __future__ import annotations

import argparse
import os
import time

from ngp_pl_tpu.config import add_train_args, config_from_args
from ngp_pl_tpu.training.system import NeRFSystem


def main():
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    args = parser.parse_args()
    tcfg = config_from_args(args)

    system = NeRFSystem(tcfg)
    ckpt_dir = f"ckpts/{tcfg.dataset_name}/{tcfg.exp_name}"

    if tcfg.ckpt_path:
        system.load(tcfg.ckpt_path)

    if not tcfg.val_only:
        t0 = time.time()
        start = int(system.state.step)
        system.fit(max_steps=tcfg.max_steps - start)
        print(f"training took {time.time() - t0:.1f}s")
        os.makedirs(ckpt_dir, exist_ok=True)
        system.save(os.path.join(ckpt_dir, f"epoch={tcfg.num_epochs}.npz"))
        system.save_slim(
            os.path.join(ckpt_dir, f"epoch={tcfg.num_epochs}_slim.npz"))

    scores = system.validate()
    if scores:
        msg = " ".join(f"{k}={v:.4f}" for k, v in scores.items())
        print(f"test: {msg}")


if __name__ == "__main__":
    main()
