#!/usr/bin/env python
"""Replay the failing 16-step block from a `nan_hunt.py` pre-failure
snapshot (benchmarking/_nan_snap.pkl) without retraining ~12k steps.

Usage: python benchmarking/nan_replay.py [path-to-snap.pkl]

The snapshot pins the exact (params, opt state, grid, RNG key, layout,
bucket) state one block before the first non-finite loss, so each
diagnosis attempt costs seconds of device time instead of ~12 minutes.
Edit ops/ guards, re-run this, and see whether the block stays finite.
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_nan_snap.pkl")
    with open(path, "rb") as f:
        d = pickle.load(f)
    from nan_hunt import build_system, replay_block

    system = build_system(d["epochs"])
    print(f"replaying from {path} (host_step {d['snap'][3]}, "
          f"schedule {d['epochs']} epochs)", flush=True)
    replay_block(system, d["snap"])


if __name__ == "__main__":
    main()
