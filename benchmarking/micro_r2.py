#!/usr/bin/env python
"""Round-2 microbenchmarks: dtype/width scaling of the encode gather/scatter
(the profiled top cost) plus candidate replacements.

Questions this answers (v5e):
  1. Is the row gather latency- or bandwidth-bound?  (f32 vs bf16 table)
  2. Does the table-gradient scatter-add get cheaper with bf16 rows or
     smaller targets?
  3. Can small (dense, coarse) levels' gradients go through a one-hot
     matmul instead of a scatter?
  4. What does the composite's segment scatter cost vs a Pallas-style pass?
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
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    N = 262144
    L = 8
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- 1. gather: dtype x width --------------------------------------
    for W, dt in ((128, jnp.float32), (128, jnp.bfloat16),
                  (64, jnp.float32), (64, jnp.bfloat16)):
        rows_total = 110000
        table = jax.random.normal(key, (rows_total, W), dt)
        slot = jnp.asarray(rng.integers(0, rows_total, L * N, dtype=np.int32))

        @jax.jit
        def gather_rows(slot, table):
            return table[slot].astype(jnp.float32).sum()
        nbytes = W * (4 if dt == jnp.float32 else 2)
        timeit(f"gather {L*N/1e6:.1f}M rows x{nbytes}B", gather_rows, slot,
               table)

    # ---- 2. scatter-add: dtype x target size ---------------------------
    for tgt_rows, W, dt in ((16384, 128, jnp.float32),
                            (16384, 128, jnp.bfloat16),
                            (8192, 128, jnp.float32),
                            (4096, 128, jnp.float32),
                            (16384, 64, jnp.float32)):
        d_rows = jax.random.normal(key, (N, W), dt)
        slot = jnp.asarray(rng.integers(0, tgt_rows, N, dtype=np.int32))

        @jax.jit
        def scatter(slot, d_rows):
            return jnp.zeros((tgt_rows, W), d_rows.dtype).at[slot].add(
                d_rows).astype(jnp.float32).sum()
        nbytes = W * (4 if dt == jnp.float32 else 2)
        mb = tgt_rows * nbytes / 1e6
        timeit(f"scatter {N/1e6:.2f}M rows x{nbytes}B -> {mb:.0f}MB",
               scatter, slot, d_rows)

    # 2b. 8-level scatter as one fused program (what the bwd actually does)
    sizes = [512, 3375, 17576, 16384, 16384, 16384, 16384, 16384]
    W = 128
    d_rows8 = jax.random.normal(key, (L, N, W), jnp.float32)
    slots8 = jnp.asarray(np.stack([
        rng.integers(0, s, N, dtype=np.int32) for s in sizes]))

    @jax.jit
    def scatter8(slots8, d_rows8):
        acc = 0.0
        for l in range(L):
            part = jnp.zeros((sizes[l], W), jnp.float32).at[
                slots8[l]].add(d_rows8[l])
            acc = acc + part.sum()
        return acc
    timeit("scatter 8 levels x 262k rows x512B (bwd shape)", scatter8,
           slots8, d_rows8)

    # ---- 3. one-hot matmul scatter for small levels --------------------
    for S in (512, 3375):
        slot = jnp.asarray(rng.integers(0, S, N, dtype=np.int32))
        d_rows = jax.random.normal(key, (N, W), jnp.bfloat16)

        @jax.jit
        def mm_scatter(slot, d_rows):
            oh = jax.nn.one_hot(slot, S, dtype=jnp.bfloat16)   # (N, S)
            return jax.lax.dot_general(
                oh, d_rows, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).sum()
        timeit(f"one-hot matmul scatter N=262k -> {S} rows", mm_scatter,
               slot, d_rows)

    # ---- 4. composite segment scatter vs pool passes -------------------
    P = 262144
    payload = jax.random.normal(key, (P, 8), jnp.float32)
    seg = jnp.sort(jnp.asarray(rng.integers(0, 8192, P, dtype=np.int32)))

    @jax.jit
    def seg_sum(seg, payload):
        return jax.ops.segment_sum(payload, seg, num_segments=8193).sum()
    timeit("segment_sum 262k x 8-lane payload -> 8k rays", seg_sum, seg,
           payload)

    # cumsum passes over the pool (the other half of composite)
    x = jax.random.normal(key, (P,), jnp.float32)

    @jax.jit
    def pool_cumsum(x):
        return jnp.cumsum(x).sum()
    timeit("cumsum over pool (262k,)", pool_cumsum, x)

    # ---- 5. window-gather at march scale: 64B vs packed wider ----------
    NW3 = 32768
    win = jnp.asarray(rng.integers(0, 2**32, (NW3, 16), dtype=np.uint64)
                      .astype(np.uint32))
    M = 8192 * 112
    idx = jnp.asarray(rng.integers(0, NW3, M, dtype=np.int32))

    @jax.jit
    def win_gather(idx, win):
        return win[idx].sum()
    timeit(f"window gather {M/1e6:.2f}M x64B", win_gather, idx, win)

    M2 = 8192 * 56
    idx2 = jnp.asarray(rng.integers(0, NW3, M2, dtype=np.int32))
    win2 = jnp.asarray(rng.integers(0, 2**32, (NW3, 32), dtype=np.uint64)
                       .astype(np.uint32))

    @jax.jit
    def win_gather2(idx2, win2):
        return win2[idx2].sum()
    timeit(f"window gather {M2/1e6:.2f}M x128B", win_gather2, idx2, win2)


if __name__ == "__main__":
    main()
