#!/usr/bin/env python
"""Round-2b micro: gather/scatter cost of WIDE rows (the paired-level
encoding candidate: 152-point rows = 320 lanes (F=2) / 640 lanes (F=4)),
plus bf16 variants and the full bwd-shape comparison."""
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


def timeit(name, fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    N = 262144
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows_total = 40000

    # gather cost vs row width/dtype, 1M rows (pairs: 4 x 262k)
    M = 4 * N
    slot = jnp.asarray(rng.integers(0, rows_total, M, dtype=np.int32))
    for W, dt in ((320, jnp.float32), (320, jnp.bfloat16),
                  (640, jnp.float32), (640, jnp.bfloat16),
                  (256, jnp.float32), (1280, jnp.bfloat16)):
        table = jax.random.normal(key, (rows_total, W), dt)

        @jax.jit
        def gather_rows(slot, table):
            return table[slot].astype(jnp.float32).sum()
        nb = W * (4 if dt == jnp.float32 else 2)
        timeit(f"gather {M/1e6:.2f}M rows x{nb}B ({W} lanes {dt.__name__})",
               gather_rows, slot, table)

    # scatter cost at pair widths
    for W, dt in ((640, jnp.float32), (640, jnp.bfloat16),
                  (320, jnp.float32)):
        d_rows = jax.random.normal(key, (M, W), dt)
        slotm = jnp.asarray(rng.integers(0, 16384, M, dtype=np.int32))

        @jax.jit
        def scatter(slotm, d_rows):
            return jnp.zeros((16384, W), d_rows.dtype).at[slotm].add(
                d_rows).astype(jnp.float32).sum()
        nb = W * (4 if dt == jnp.float32 else 2)
        timeit(f"scatter {M/1e6:.2f}M rows x{nb}B", scatter, slotm, d_rows)

    # 4-pair fused bwd shape: scatter 4 x 262k x 640-lane bf16
    sizes = [4096, 16384, 16384, 16384]
    d4 = jax.random.normal(key, (4, N, 640), jnp.bfloat16)
    s4 = jnp.asarray(np.stack([
        rng.integers(0, s, N, dtype=np.int32) for s in sizes]))

    @jax.jit
    def scatter4(s4, d4):
        acc = 0.0
        for l in range(4):
            part = jnp.zeros((sizes[l], 640), jnp.bfloat16).at[
                s4[l]].add(d4[l])
            acc = acc + part.astype(jnp.float32).sum()
        return acc
    timeit("scatter 4 pairs x 262k rows x1280B bf16 (bwd shape)",
           scatter4, s4, d4)

    d4f = jax.random.normal(key, (4, N, 640), jnp.float32)

    @jax.jit
    def scatter4f(s4, d4f):
        acc = 0.0
        for l in range(4):
            part = jnp.zeros((sizes[l], 640), jnp.float32).at[
                s4[l]].add(d4f[l])
            acc = acc + part.sum()
        return acc
    timeit("scatter 4 pairs x 262k rows x2560B f32 (bwd shape)",
           scatter4f, s4, d4f)

    # permutation gather for composite (P rows x 32B payload)
    P = 262144
    pay = jax.random.normal(key, (P, 8), jnp.float32)
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))

    @jax.jit
    def perm_gather(perm, pay):
        return pay[perm].sum()
    timeit("permutation gather 262k x 32B", perm_gather, perm, pay)

    # dense-layout composite: cumsum along axis 1 of (8192, 32)
    x = jax.random.normal(key, (8192, 32), jnp.float32)

    @jax.jit
    def row_cumsum(x):
        return jnp.cumsum(x, axis=1).sum()
    timeit("cumsum (8192, 32) axis=1", row_cumsum, x)


if __name__ == "__main__":
    main()
