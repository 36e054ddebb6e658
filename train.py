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
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for a multi-host "
                             "pod run (reference: Lightning DDP spawn)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of steps 64-96 "
                             "here (TensorBoard / Perfetto)")
    args = parser.parse_args()
    tcfg = config_from_args(args)

    if args.multihost:
        from ngp_pl_tpu.parallel.mesh import init_distributed

        proc = init_distributed()
        print(f"multihost: process {proc} of "
              f"{__import__('jax').process_count()}")

    system = NeRFSystem(tcfg)
    ckpt_dir = f"ckpts/{tcfg.dataset_name}/{tcfg.exp_name}"

    if tcfg.ckpt_path:
        system.load(tcfg.ckpt_path)

    if not tcfg.val_only:
        t0 = time.time()
        start = int(system.state.step)
        system.fit(max_steps=tcfg.max_steps - start,
                   profile_dir=args.profile_dir)
        print(f"training took {time.time() - t0:.1f}s")
        os.makedirs(ckpt_dir, exist_ok=True)
        system.save(os.path.join(ckpt_dir, f"epoch={tcfg.num_epochs}.npz"))
        system.save_slim(
            os.path.join(ckpt_dir, f"epoch={tcfg.num_epochs}_slim.npz"))

    scores = system.validate()
    if scores:
        msg = " ".join(f"{k}={v:.4f}" for k, v in scores.items())
        print(f"test: {msg}")

    # assemble test-view videos from the validation renders (reference
    # train.py:284-293: rgb + depth mp4s for synthetic NSVF runs)
    if (not tcfg.no_save_test and tcfg.dataset_name == "nsvf"
            and "Synthetic" in (tcfg.root_dir or "")):
        import imageio.v2 as imageio

        val_dir = f"results/{tcfg.dataset_name}/{tcfg.exp_name}"
        imgs = sorted(
            f for f in os.listdir(val_dir) if f.endswith(".png"))
        rgb = [imageio.imread(os.path.join(val_dir, f))
               for f in imgs if not f.endswith("_d.png")]
        dep = [imageio.imread(os.path.join(val_dir, f))
               for f in imgs if f.endswith("_d.png")]
        from ngp_pl_tpu.utils.video import write_video

        if rgb:
            write_video(os.path.join(val_dir, "rgb.mp4"), rgb, fps=30)
        if dep:
            write_video(os.path.join(val_dir, "depth.mp4"), dep, fps=30)


if __name__ == "__main__":
    main()
