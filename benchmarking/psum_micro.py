#!/usr/bin/env python
"""Gradient-psum cost: measured single-chip floor + mechanically-derived
multi-chip projection (VERDICT r4 #9).

This environment exposes ONE real chip, so the ICI wire time of a
multi-chip all-reduce cannot be measured directly.  What CAN be grounded:

  1. MEASURED: the dispatch + kernel floor of an all-reduce program over
     the real flagship gradient pytree on a 1-device mesh (XLA emits the
     collective; with world size 1 it degenerates to a copy — the
     measured time bounds the non-wire overhead).
  2. MEASURED: HBM read+write throughput for the same tree (the local
     reduce of a ring all-reduce is HBM-bound; each chip reads+writes the
     full tree ~2x during the ring).
  3. DERIVED: ring all-reduce wire time = 2(n-1)/n * bytes / ICI_BW.
     ICI_BW is the published per-link figure (v5e: 4 links x ~186 GB/s
     bidirectional => ~100 GB/s conservative effective for one ring
     direction; v4: higher).  The projection prints the efficiency
     implied against the measured single-chip step time.

Usage: python benchmarking/psum_micro.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

ICI_GBPS = 100.0          # conservative effective ring bandwidth, one dir
STEP_MS = 53.0            # measured honest single-chip step (PERF.md)


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.models.ngp import NGP

    tcfg = TrainConfig()
    ngp = NGP(tcfg.ngp_config(), need_x_grad=False)
    params = ngp.init(jax.random.PRNGKey(0))
    nbytes = sum(np.asarray(p).nbytes
                 for p in jax.tree_util.tree_leaves(params))
    mb = nbytes / 2 ** 20
    print(f"flagship gradient tree: {mb:.1f} MB", flush=True)

    # 1. all-reduce program floor on a 1-device mesh
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    repl = NamedSharding(mesh, P())
    params_d = jax.device_put(params, repl)

    @jax.jit
    def allreduce(tree):
        def one(leaf):
            return jax.lax.psum(leaf, "data")
        return jax.shard_map(
            lambda t: jax.tree_util.tree_map(one, t),
            mesh=mesh, in_specs=(P(),), out_specs=P())(tree)

    t_ar = timeit(allreduce, params_d)
    print(f"1-device all-reduce program: {t_ar:.3f} ms "
          f"(dispatch + copy floor, no wire)", flush=True)

    # 2. HBM read+write throughput for the tree (local-reduce bound)
    @jax.jit
    def touch(tree):
        return jax.tree_util.tree_map(lambda x: x * 1.0000001, tree)

    t_rw = timeit(touch, params_d)
    bw = 2 * nbytes / (t_rw / 1e3) / 2 ** 30
    print(f"read+write pass: {t_rw:.3f} ms ({bw:.0f} GiB/s HBM)", flush=True)

    # 3. derived ring wire time + implied weak-scaling efficiency
    rows = []
    for n in (2, 4, 8, 16):
        wire_ms = 2 * (n - 1) / n * nbytes / (ICI_GBPS * 1e9) * 1e3
        total_ms = wire_ms + t_ar + 2 * t_rw      # wire + program + reduce
        eff = STEP_MS / (STEP_MS + total_ms)
        rows.append({"n": n, "wire_ms": round(wire_ms, 2),
                     "psum_total_ms": round(total_ms, 2),
                     "weak_scaling_eff": round(eff, 4)})
        print(f"n={n:2d}: wire {wire_ms:5.2f} ms  total psum "
              f"{total_ms:5.2f} ms  implied efficiency {eff:6.1%}",
              flush=True)
    print(json.dumps({
        "metric": "psum_projection", "grad_mb": round(mb, 1),
        "measured_program_floor_ms": round(t_ar, 3),
        "measured_rw_ms": round(t_rw, 3),
        "ici_gbps_assumed": ICI_GBPS, "rows": rows}))


if __name__ == "__main__":
    main()
