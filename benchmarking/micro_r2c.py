#!/usr/bin/env python
"""Round-2 micro: raw gather/scatter/cumsum rates at the bench pool shapes
on the real chip, to rank the encode/march/composite attack order."""
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
    print(f"{name:46s} {dt:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    N = 262144
    L, W = 8, 128
    S = 16384          # hashed-level rows
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((L * S, W)), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    slots = jnp.asarray(rng.integers(0, L * S, (L, N)), jnp.int32)
    slots_lvl = jnp.asarray(rng.integers(0, S, (L, N)), jnp.int32)
    rows = jnp.asarray(rng.random((L, N, W)), jnp.float32)
    rows_bf = rows.astype(jnp.bfloat16)

    # 1. merged level-major gather (the encode fwd gather): L*N rows
    @jax.jit
    def gather_f32(t, s):
        return t[s.reshape(-1)].reshape(L, N, W).sum()
    dt = timeit("gather 2M rows f32 (512B)", gather_f32, table, slots)
    print(f"   -> {dt*1e6/(L*N):.2f} ns/row", file=sys.stderr)

    @jax.jit
    def gather_bf(t, s):
        return t[s.reshape(-1)].reshape(L, N, W).sum()
    dt = timeit("gather 2M rows bf16 (256B)", gather_bf, table_bf, slots)
    print(f"   -> {dt*1e6/(L*N):.2f} ns/row", file=sys.stderr)

    # gather only 1 level (262k rows) to see fixed overhead
    @jax.jit
    def gather_1l(t, s):
        return t[s[0]].sum()
    dt = timeit("gather 262k rows f32", gather_1l, table, slots)
    print(f"   -> {dt*1e6/N:.2f} ns/row", file=sys.stderr)

    # narrow gather: 4-byte rows
    vec = jnp.asarray(rng.random((L * S,)), jnp.float32)

    @jax.jit
    def gather_narrow(v, s):
        return v[s.reshape(-1)].sum()
    dt = timeit("gather 2M scalars f32 (4B)", gather_narrow, vec, slots)
    print(f"   -> {dt*1e6/(L*N):.2f} ns/row", file=sys.stderr)

    # 2. per-level scatter-add (the encode bwd): L scatters of N rows
    @jax.jit
    def scatter_per_level(rws, s):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((S, W), jnp.float32).at[s[l]].add(rws[l]))
        return jnp.stack(parts).sum()
    dt = timeit("scatter-add 8x262k rows f32 -> 8MB", scatter_per_level,
                rows, slots_lvl)
    print(f"   -> {dt*1e6/(L*N):.2f} ns/row", file=sys.stderr)

    # scatter to small target (dense level)
    @jax.jit
    def scatter_small(rws, s):
        return jnp.zeros((512, W), jnp.float32).at[s[0] & 511].add(rws[0]).sum()
    dt = timeit("scatter-add 262k rows -> 256KB target", scatter_small,
                rows, slots_lvl)
    print(f"   -> {dt*1e6/N:.2f} ns/row", file=sys.stderr)

    # scatter bf16 rows upcast into f32 target
    @jax.jit
    def scatter_bf_src(rws, s):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((S, W), jnp.float32)
                         .at[s[l]].add(rws[l].astype(jnp.float32)))
        return jnp.stack(parts).sum()
    dt = timeit("scatter-add 8x262k bf16-src rows", scatter_bf_src,
                rows_bf, slots_lvl)
    print(f"   -> {dt*1e6/(L*N):.2f} ns/row", file=sys.stderr)

    # 3. segment one-hot matmul alternative for a dense level:
    # d_table = onehot(slots)^T @ rows via (S_small, N) x (N, W)
    @jax.jit
    def onehot_mm(rws, s):
        oh = (s[0][:, None] & 511) == jnp.arange(512)[None, :]
        return jax.lax.dot_general(
            oh.astype(jnp.bfloat16), rws[0].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).sum()
    timeit("onehot-matmul 262k rows -> 512-row table", onehot_mm,
           rows, slots_lvl)

    # 4. plain VPU pass rates over pool-sized tensors
    big = jnp.asarray(rng.random((L, N, W)), jnp.float32)

    @jax.jit
    def vpu_pass(b):
        return (b * 1.0001 + 0.5).sum()
    dt = timeit("elementwise pass over (8,262k,128) f32 1GB", vpu_pass, big)
    print(f"   -> {1.073/dt*1e3:.0f} GB/s read", file=sys.stderr)

    # 5. cumsum over pool
    flat = jnp.asarray(rng.random((N,)), jnp.float32)

    @jax.jit
    def cumsum_flat(f):
        return jnp.cumsum(f).sum()
    timeit("cumsum (262144,) f32", cumsum_flat, flat)

    pool8 = jnp.asarray(rng.random((N, 8)), jnp.float32)
    seg = jnp.asarray(np.sort(rng.integers(0, 8192, N)), jnp.int32)

    @jax.jit
    def segsum(p, s):
        return jax.ops.segment_sum(p, s, num_segments=8193).sum()
    dt = timeit("segment_sum (262k,8) -> 8k segs", segsum, pool8, seg)
    print(f"   -> {dt*1e6/N:.2f} ns/row", file=sys.stderr)

    # 6. top_k over (8192, 896) (march first-S selection)
    keys = jnp.asarray(rng.integers(-900, 0, (8192, 896)), jnp.int32)

    @jax.jit
    def topk(k):
        v, i = jax.lax.top_k(k, 32)
        return v.sum() + i.sum()
    timeit("top_k 32 over (8192,896)", topk, keys)

    # 7. MXU rate check: the full pool MLP stack shapes
    x = jnp.asarray(rng.random((N, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.random((64, 64)), jnp.bfloat16)

    @jax.jit
    def mm(x, w):
        h = x
        for _ in range(4):
            h = jnp.maximum(h @ w, 0)
        return h.sum()
    timeit("4x (262k,64)@(64,64) bf16 relu", mm, x, w)


if __name__ == "__main__":
    main()
