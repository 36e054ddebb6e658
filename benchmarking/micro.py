#!/usr/bin/env python
"""Microbenchmarks of the primitives behind march + encode at bench shapes."""
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

from ngp_pl_tpu.ops.hash_encoding import make_grid_spec


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
    print(f"{name:52s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    spec = make_grid_spec()
    rows_total = spec.total_rows
    N = 262144
    L = spec.n_levels
    W = spec.row_width
    print(f"table rows {rows_total} ({rows_total*W*4/1e6:.0f} MB fp32)",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows_total, W), jnp.float32)
    # level-major slots like the real encode: level l's slots in its range
    rng = np.random.default_rng(0)
    slot_np = np.concatenate([
        rng.integers(spec.offsets[l], spec.offsets[l] + spec.sizes[l],
                     N, dtype=np.int32)
        for l in range(L)
    ])                                                   # (L*N,) level-major
    slot = jnp.asarray(slot_np)
    # ray-coherent variant: runs of repeated slots (run length from level res)
    slot_coh_np = []
    for l in range(L):
        run = max(1, int(1176 / spec.resolutions[l]))
        m = N // run + 1
        s = rng.integers(spec.offsets[l], spec.offsets[l] + spec.sizes[l],
                         m, dtype=np.int32)
        slot_coh_np.append(np.repeat(s, run)[:N])
    slot_coh = jnp.asarray(np.concatenate(slot_coh_np))

    @jax.jit
    def gather_rows(slot, table):
        return table[slot].sum()
    timeit(f"row gather {L*N/1e6:.1f}M x256B (random)", gather_rows, slot,
           table)
    timeit(f"row gather {L*N/1e6:.1f}M x256B (ray-coherent)", gather_rows,
           slot_coh, table)

    d_rows = jax.random.normal(key, (L * N, W), jnp.float32)

    @jax.jit
    def scatter_whole(slot, d_rows):
        return jnp.zeros((rows_total, W), jnp.float32).at[slot].add(
            d_rows).sum()
    timeit(f"scatter-add {L*N/1e6:.1f}M x256B whole-table", scatter_whole,
           slot, d_rows)

    @jax.jit
    def scatter_per_level(slot, d_rows):
        acc = 0.0
        for l in range(L):
            part = jnp.zeros((spec.sizes[l], W), jnp.float32).at[
                slot[l * N:(l + 1) * N] - spec.offsets[l]].add(
                d_rows[l * N:(l + 1) * N])
            acc = acc + part.sum()
        return acc
    timeit(f"scatter-add {L*N/1e6:.1f}M x256B per-level", scatter_per_level,
           slot, d_rows)
    timeit("scatter-add per-level (ray-coherent)", scatter_per_level,
           slot_coh, d_rows)

    # dedup: segment-sum by run (cumsum trick) + one scatter per run
    @jax.jit
    def scatter_dedup(slot, d_rows):
        acc = 0.0
        for l in range(L):
            s = slot[l * N:(l + 1) * N]
            d = d_rows[l * N:(l + 1) * N]
            new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
            csum = jnp.cumsum(d, axis=0)
            # run end = position before next run start (or last)
            endv = jnp.where(new[:, None], csum - d, 0.0)
            # sum of run = csum[end] - csum[start-1]; use scatter of run sums
            seg_id = jnp.cumsum(new.astype(jnp.int32)) - 1
            run_sum = jnp.zeros((N, W), jnp.float32).at[seg_id].add(d)
            part = jnp.zeros((spec.sizes[l], W), jnp.float32).at[
                jnp.where(new, s - spec.offsets[l], spec.sizes[l])].add(
                jnp.where(new[:, None], run_sum, 0.0), mode="drop")
            acc += part.sum()
        return acc
    timeit("scatter-add dedup-by-run (ray-coherent)", scatter_dedup,
           slot_coh, d_rows)

    # occupancy z-line gathers at march scale
    occ_rows = jnp.asarray(
        rng.integers(0, 2**32, (128 * 128, 4), dtype=np.uint64).astype(
            np.uint32))
    M = 8192 * 896
    line_idx = jnp.asarray(rng.integers(0, 128 * 128, M, dtype=np.int32))

    @jax.jit
    def occ_gather(line_idx, occ_rows):
        return occ_rows[line_idx].sum()
    timeit(f"occ z-line gather {M/1e6:.1f}M x16B", occ_gather, line_idx,
           occ_rows)

    # top_k at march shape
    keys_a = jax.random.normal(key, (8192, 144))

    @jax.jit
    def topk(keys_a):
        v, i = jax.lax.top_k(keys_a, 112)
        return v.sum() + i.sum()
    timeit("top_k (8192,144)->112", topk, keys_a)

    # argsort alternative
    @jax.jit
    def asort(keys_a):
        return jnp.argsort(keys_a, axis=1).sum()
    timeit("argsort (8192,144)", asort, keys_a)

    # compaction at bench shapes
    from ngp_pl_tpu.ops.ray_march import _compact_to_pool
    B, K = 8192, 896
    occ = jnp.asarray(rng.random((B, K)) < 0.3)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
    t0 = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def compact(occ, kk, t0):
        out = _compact_to_pool(occ, kk, t0, B, K, 1024, 262144, 0.0,
                               0.001, 0.01)
        return out[0].sum() + out[6]
    timeit("compact_to_pool (8192x896 -> 262144)", compact, occ, kk, t0)

    # encode fwd decomposition
    from ngp_pl_tpu.ops.hash_encoding import (
        _slots_local_frac_lm, _wrow_lm, expand_w1)
    x = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
    w1 = jax.random.normal(jax.random.PRNGKey(4), (32, 64), jnp.float32)

    @jax.jit
    def slots_only(x):
        slot, local, frac = _slots_local_frac_lm(x, spec)
        return slot.sum() + frac.sum()
    timeit("encode: slots/frac math only", slots_only, x)

    @jax.jit
    def gather_only(x, table):
        slot, local, frac = _slots_local_frac_lm(x, spec)
        rows = table[slot.reshape(-1)].reshape(L, N, W)
        return rows.sum()
    timeit("encode: slots + row gather", gather_only, x, table)

    @jax.jit
    def gather_wrow(x, table):
        slot, local, frac = _slots_local_frac_lm(x, spec)
        rows = table[slot.reshape(-1)].reshape(L, N, W)
        wrow = _wrow_lm(local, frac, spec)
        wr = (rows.astype(jnp.float32) * wrow).astype(jnp.bfloat16)
        return wr.sum()
    timeit("encode: + wrow product", gather_wrow, x, table)

    @jax.jit
    def full_fused(x, table, w1):
        slot, local, frac = _slots_local_frac_lm(x, spec)
        rows = table[slot.reshape(-1)].reshape(L, N, W)
        wrow = _wrow_lm(local, frac, spec)
        wr = (rows.astype(jnp.float32) * wrow).astype(jnp.bfloat16)
        w1big = expand_w1(w1, spec)
        h1 = jax.lax.dot_general(
            wr, w1big.astype(jnp.bfloat16),
            dimension_numbers=(((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        return h1.sum()
    timeit("encode: + dot_general (full fwd)", full_fused, x, table, w1)


if __name__ == "__main__":
    main()
