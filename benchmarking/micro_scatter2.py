#!/usr/bin/env python
"""On-chip A/B of the table-gradient scatter alternatives (VERDICT r4 #3).

Per-level at the honest bench shapes (P ~= 330k pool rows, flagship L8F4
level sizes 512..16384): XLA scatter-add vs the Pallas sequential-VMEM
accumulator vs the MXU one-hot reduction (dense levels only).

Usage: python benchmarking/micro_scatter2.py [P]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    def fence(x):
        # block_until_ready does NOT reliably block through the axon
        # tunnel; a host readback of one element does
        float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / n * 1e3


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 327680   # 8192 x 40
    W = 128
    from ngp_pl_tpu.ops.scatter_accum import scatter_accum, scatter_onehot

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(P, W)).astype(np.float32))
    sizes = (512, 2744, 17576, 16384)        # flagship level row counts
    mult = {512: 1, 2744: 1, 17576: 1, 16384: 5}
    total = {"xla": 0.0, "best": 0.0}
    for R in sizes:
        # ray-coherent duplicates like the real pool: runs of repeated rows
        run = max(1, int(74 * 512 / R))
        base = rng.integers(0, R, -(-P // run))
        idx = jnp.asarray(np.repeat(base, run)[:P].astype(np.int32))

        def xla_scatter(d, idx, R=R):
            return jnp.zeros((R, W), jnp.float32).at[idx].add(d)

        t_x = timeit(jax.jit(xla_scatter, static_argnames=()), d, idx)
        Rpad = -(-R // 8) * 8
        t_a = timeit(lambda d, i: scatter_accum(d, i, n_rows=Rpad), d, idx)
        line = (f"R {R:6d} run~{run:3d}: xla {t_x:7.3f} ms  "
                f"accum {t_a:7.3f} ms")
        t_best = min(t_x, t_a)
        if R <= 4096:
            t_o = timeit(lambda d, i: scatter_onehot(
                d, i, n_rows=Rpad, exact=True), d, idx)
            t_ob = timeit(lambda d, i: scatter_onehot(
                d, i, n_rows=Rpad, exact=False), d, idx)
            line += f"  onehot_f32 {t_o:7.3f} ms  onehot_bf16 {t_ob:7.3f} ms"
            t_best = min(t_best, t_o)
        print(line, flush=True)
        total["xla"] += t_x * mult[R]
        total["best"] += t_best * mult[R]
    print(f"approx all-8-level totals: xla {total['xla']:.2f} ms  "
          f"best-mix {total['best']:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
