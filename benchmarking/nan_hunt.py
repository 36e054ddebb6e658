#!/usr/bin/env python
"""Reproduce + bisect the long-horizon NaN (first seen ~step 12k of a 30k
procedural run).  Trains in 16-step blocks, snapshots (state, grid, key)
every block, and on the first non-finite loss re-runs the failing block
step-by-step from the snapshot, dumping which parameter/gradient leaf goes
non-finite first plus field statistics."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def leaf_stats(tree, name=""):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        key = name + jax.tree_util.keystr(path)
        out.append((key, float(np.abs(a).max()),
                    int(np.isnan(a).sum()), int(np.isinf(a).sum())))
    return out


def build_system(epochs):
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                       num_epochs=epochs,
                       iters_per_epoch=1000,
                       exp_name="nan_hunt", no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=2)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    return system


def restore(system, snap):
    (system.state, system.grid_state, system.key, system._host_step,
     system.layout, system._pool_mult, system.chain_length,
     system._pool_demand, system._pending_demand) = snap


def replay_block(system, snap):
    """Restore the pre-failure snapshot, replay its block step-by-step and
    dump which leaf / stage goes non-finite first."""
    nb = system.tcfg.grid_update_interval
    restore(system, snap)
    print("replaying the failing block step-by-step...", flush=True)
    for j in range(nb):
        before = system.state
        key_before = system.key if j > 0 else None
        m = system.step()
        if key_before is None:
            key_before = system.key   # step 0 split the key for grid update
        loss = float(np.asarray(m["loss"]))
        print(f"  step {system._host_step}: loss {loss:.6f}", flush=True)
        if not np.isfinite(loss):
            from nan_probe import probe

            probe(system, before, key_before)
            print("  first bad step found; param stats BEFORE:", flush=True)
            for k, mx, nn, ni in leaf_stats(before.params, "params"):
                flag = " <== " if (nn or ni) else ""
                print(f"    {k:60s} absmax {mx:12.4e} nan {nn} inf {ni}"
                      f"{flag}", flush=True)
            print("  param stats AFTER:", flush=True)
            for k, mx, nn, ni in leaf_stats(system.state.params, "params"):
                if nn or ni or mx > 1e4:
                    print(f"    {k:60s} absmax {mx:12.4e} nan {nn} inf {ni}",
                          flush=True)
            print("  opt state after:", flush=True)
            for k, mx, nn, ni in leaf_stats(system.state.opt_state, "opt"):
                if nn or ni or mx > 1e6:
                    print(f"    {k:60s} absmax {mx:12.4e} nan {nn} inf {ni}",
                          flush=True)
            g = np.asarray(system.grid_state.occ_grid)
            print(f"  occ occupancy {float((g > 0).mean()):.4f}", flush=True)
            break


def main():
    steps = int(os.environ.get("HUNT_STEPS", 16384))
    # HUNT_EPOCHS pins the lr-schedule length independently of how far the
    # hunt runs: the ~12.2k-step blow-up only reproduces under the 30-epoch
    # cosine schedule (HUNT_EPOCHS=30) — a schedule derived from HUNT_STEPS
    # holds a lower lr at the same step and sails through (round-4 data)
    epochs = int(os.environ.get("HUNT_EPOCHS", max(1, steps // 1000)))
    system = build_system(epochs)
    nb = system.tcfg.grid_update_interval

    for i in range(steps // nb):
        snap = (system.state, system.grid_state, system.key,
                system._host_step, system.layout, system._pool_mult,
                system.chain_length, system._pool_demand,
                system._pending_demand)
        m = system.step_block()
        loss = float(np.asarray(m["loss"]))
        step_now = (i + 1) * nb
        if step_now % 512 == 0:
            tbl = np.asarray(system.state.params["hash_table"])
            print(f"step {step_now:6d} loss {loss:.5f} "
                  f"rm_s {float(np.asarray(m['rm_samples']))/8192:5.1f} "
                  f"tbl_absmax {np.abs(tbl).max():9.2f} "
                  f"S {system._pool_mult} {system.layout}", flush=True)
        if not np.isfinite(loss):
            print(f"*** non-finite loss in block ending at step {step_now}",
                  flush=True)
            break
    else:
        print("no NaN reproduced", flush=True)
        return

    # persist the pre-failure snapshot so later diagnosis can replay the
    # failing block directly instead of retraining ~12k steps (~12 min of
    # tunnel time per attempt)
    import pickle

    snap_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "_nan_snap.pkl")
    # np.asarray over the WHOLE payload: _pending_demand (snap[8]) can be a
    # live device array; pickling it ties the snapshot to this jax version.
    # Strings/ints pass through tree_map as leaves unchanged.
    host_snap = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, snap)
    with open(snap_path, "wb") as f:
        pickle.dump({"snap": host_snap, "steps": steps, "epochs": epochs}, f)
    print(f"pre-failure snapshot -> {snap_path}", flush=True)

    replay_block(system, snap)


if __name__ == "__main__":
    main()
