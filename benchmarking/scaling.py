"""Weak-scaling harness: rays/s/device vs device count.

North star (BASELINE.md): >= 85% rays/s scaling efficiency from 1 to 2
hosts.  On a pod, run this as-is (real devices, ICI/DCN collectives); on a
dev box it measures the virtual CPU mesh (1..8 faked devices), which
validates the harness + sharding structure, not silicon.

Each device count runs in a fresh subprocess because the virtual device
count is fixed at backend init (XLA_FLAGS).  Weak scaling: the global batch
grows with the mesh so per-device work is constant; efficiency is
rays/s/device normalized to the 1-device run.

Usage:
    python benchmarking/scaling.py                # 1 2 4 8 virtual CPU devs
    python benchmarking/scaling.py --devices 4 8  # real TPU pod slice
    python benchmarking/scaling.py --real         # no CPU faking
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["NGP_REPO"])
from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import jax
import numpy as np
from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem

n_dev = int(sys.argv[1])
per_dev_batch = int(sys.argv[2])
steps = int(sys.argv[3])
assert jax.device_count() >= n_dev, (jax.device_count(), n_dev)

tcfg = TrainConfig(dataset_name="synthetic",
                   batch_size=per_dev_batch * n_dev,
                   num_devices=n_dev, exp_name="scaling",
                   no_save_test=True)
train_ds = SyntheticDataset(split="train", img_size=64, n_train=4)
test_ds = SyntheticDataset(split="test", img_size=64, n_test=1)
system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
system.on_train_start()

def fence(m):
    return float(np.asarray(m["loss"]))

nb = tcfg.grid_update_interval
warm = max(2, steps // (4 * nb))
for _ in range(warm):
    m = system.step_block()
fence(m)
system.freeze_buckets = True
t0 = time.time()
for _ in range(steps // nb):
    m = system.step_block()
fence(m)
dt = time.time() - t0
rays_per_s = tcfg.batch_size * (steps // nb) * nb / dt
print(json.dumps({"n_dev": n_dev, "rays_per_s": rays_per_s}))
"""


def run_one(n_dev: int, per_dev_batch: int, steps: int, fake_cpu: bool):
    env = dict(os.environ, NGP_REPO=_REPO)
    if fake_cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n_dev}"
                            ).strip()
    worker = os.path.join(_REPO, ".scaling_worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    out = subprocess.run(
        [sys.executable, worker, str(n_dev), str(per_dev_batch), str(steps)],
        env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"{n_dev}-device run failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per_dev_batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--real", action="store_true",
                    help="use real devices (pod) instead of faked CPU mesh")
    args = ap.parse_args()

    results = []
    for n in args.devices:
        r = run_one(n, args.per_dev_batch, args.steps, fake_cpu=not args.real)
        results.append(r)
        base = results[0]["rays_per_s"] / results[0]["n_dev"]
        per_dev = r["rays_per_s"] / r["n_dev"]
        print(f"devices {n:2d}  rays/s {r['rays_per_s']:12.0f}  "
              f"per-dev {per_dev:12.0f}  efficiency {per_dev / base:6.1%}",
              flush=True)
    print(json.dumps({"metric": "weak_scaling", "results": results}))


if __name__ == "__main__":
    main()
