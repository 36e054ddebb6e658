#!/usr/bin/env python
"""Offline evaluation of a trained checkpoint (reference test.ipynb):
per-view PSNR/SSIM (optional LPIPS), whole-image FPS timing with an explicit
device fence, and optional mesh extraction from the density field.

Examples:
    python eval.py --root_dir /data/Synthetic_NeRF/Lego \
        --weight_path ckpts/nsvf/Lego/epoch=30_slim.npz
    python eval.py --root_dir '' --dataset_name synthetic \
        --weight_path ckpts/synthetic/exp/epoch=2_slim.npz \
        --mesh_path lego.ply --mesh_resolution 256
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from ngp_pl_tpu.config import add_train_args, config_from_args
from ngp_pl_tpu.training.system import NeRFSystem


def main():
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    parser.add_argument("--fps_frames", type=int, default=5,
                        help="frames for the FPS timing loop (test.ipynb)")
    parser.add_argument("--mesh_path", type=str, default=None,
                        help="write an OBJ/PLY isosurface mesh here")
    parser.add_argument("--mesh_resolution", type=int, default=256)
    parser.add_argument("--mesh_threshold", type=float, default=20.0,
                        help="sigma iso level (test.ipynb uses ~20)")
    args = parser.parse_args()
    tcfg = config_from_args(args).replace(val_only=True)

    system = NeRFSystem(tcfg)
    assert tcfg.weight_path or tcfg.ckpt_path, \
        "--weight_path (slim) or --ckpt_path (full) required"
    if tcfg.ckpt_path:
        system.load(tcfg.ckpt_path)

    scores = system.validate()
    if scores:
        print("test:", " ".join(f"{k}={v:.4f}" for k, v in scores.items()))

    # FPS timing on the first test pose (test.ipynb cell 3 with cuda sync)
    ds = system.test_dataset
    pose = ds.poses[0]
    out = system.render_image.from_pose(
        system.state.params, system.grid_state.occ_grid,
        ds.directions, pose)                        # warm compile
    t0 = time.time()
    for _ in range(args.fps_frames):
        out = system.render_image.from_pose(
            system.state.params, system.grid_state.occ_grid,
            ds.directions, pose)
        float(np.asarray(out["rgb"]).ravel()[0])    # device fence
    dt = (time.time() - t0) / args.fps_frames
    w, h = ds.img_wh
    print(f"render: {1.0 / dt:.2f} FPS at {w}x{h} "
          f"({out['total_samples'] / (w * h):.1f} samples/ray)")

    if args.mesh_path:
        from ngp_pl_tpu.utils.mesh import extract_mesh, save_mesh_obj, \
            save_mesh_ply

        verts, faces = extract_mesh(
            lambda x: system.ngp.density(system.state.params, x),
            resolution=args.mesh_resolution,
            scale=system.cfg.scale,
            level=args.mesh_threshold)
        if args.mesh_path.endswith(".obj"):
            save_mesh_obj(args.mesh_path, verts, faces)
        else:
            save_mesh_ply(args.mesh_path, verts, faces)
        print(f"mesh: {len(verts)} verts {len(faces)} faces "
              f"-> {args.mesh_path}")


if __name__ == "__main__":
    main()
