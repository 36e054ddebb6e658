#!/usr/bin/env python
"""Micro: windowed-march stage decomposition at bench shapes
(N=8192 rays, chain 896, pool 262144)."""
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

from ngp_pl_tpu.ops.ray_march import (
    SEGMENT_J,
    _compact_to_pool,
    _occ_window_chain,
    march_rays_train_window,
    occupancy_windows,
)


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
    N, K, G = 8192, 896, 128
    scale, max_samples = 0.5, 1024
    pool = 262144
    dt_min = 3 ** 0.5 / max_samples
    rng = np.random.default_rng(0)
    occ_grid = (rng.random((1, G, G, G)) < 0.08).astype(np.uint8)
    win_rows = occupancy_windows(jnp.asarray(occ_grid))

    d = rng.normal(size=(N, 3)) * np.float32([0.3, 0.3, 0.1]) + [0, 0, 1.0]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays_o = np.tile(np.float32([[0.1, -0.05, -1.6]]), (N, 1))
    inv = 1.0 / d
    lo = (-scale - rays_o) * inv
    hi = (scale - rays_o) * inv
    t1 = np.maximum(np.minimum(lo, hi).max(1), 0.01)
    t2 = np.maximum(lo, hi).min(1)
    hits = np.stack([t1, t2], -1).astype(np.float32)
    noise = rng.random(N).astype(np.float32)

    rays_o = jnp.asarray(rays_o)
    rays_d = jnp.asarray(d)
    hits = jnp.asarray(hits)
    noise = jnp.asarray(noise)
    t0v = hits[:, 0] + dt_min * jnp.asarray(noise)

    @jax.jit
    def win_chain(win_rows, t0v):
        occ, ts = _occ_window_chain(rays_o, rays_d, t0v, K // SEGMENT_J,
                                    win_rows, scale=scale, grid_size=G,
                                    dt_min=dt_min)
        return occ.sum()
    timeit("occ window chain (gather + bit extract)", win_chain, win_rows,
           t0v)

    occ_np = (rng.random((N, K)) < 0.25)
    occ_j = jnp.asarray(occ_np)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))

    @jax.jit
    def compact(occ, t0v):
        out = _compact_to_pool(occ, kk, t0v, N, K, max_samples, pool, 0.0,
                               dt_min, 2 * dt_min)
        return out[0].sum() + out[6]
    timeit("compact_to_pool", compact, occ_j, t0v)

    @jax.jit
    def full(win_rows):
        m = march_rays_train_window(
            rays_o, rays_d, hits, noise, win_rows, scale=scale, grid_size=G,
            max_samples=max_samples, pool_size=pool, chain_length=K)
        return m.ts.sum() + m.total
    timeit("march_rays_train_window (full)", full, win_rows)


def compact_bisect():
    """Time cumulative prefixes of _compact_to_pool's graph."""
    import math

    N, K = 8192, 896
    max_samples, pool_size = 1024, 262144
    dt_min = math.sqrt(3.0) / max_samples
    dt_max = 2 * dt_min
    rng = np.random.default_rng(0)
    occ0 = jnp.asarray(rng.random((N, K)) < 0.25)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
    t0v = jnp.zeros((N,), jnp.float32)

    GRP = 32
    NG = N * K // GRP
    blocks = max(2 * (pool_size // GRP), 1)
    P = pool_size

    def stage1(occ, t0):
        rm_counts = occ.sum(axis=1, dtype=jnp.int32)
        counts = rm_counts
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        total = jnp.minimum(jnp.sum(counts), pool_size).astype(jnp.int32)
        occ_g = occ.reshape(NG, GRP)
        lane_w = (jnp.uint32(1) << jnp.arange(GRP, dtype=jnp.uint32))
        bits = (occ_g.astype(jnp.uint32) * lane_w[None, :]).sum(
            axis=1, dtype=jnp.uint32)
        grp_any = bits != 0
        grp_rank = jnp.cumsum(grp_any.astype(jnp.int32)) - grp_any
        tgt = jnp.where(grp_any & (grp_rank < blocks), grp_rank, blocks)
        ray_of_grp = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None],
            (N, K // GRP)).reshape(NG)
        t0_of_grp = jnp.broadcast_to(t0[:, None], (N, K // GRP)).reshape(NG)
        n_sub = max(GRP // 8, 1)
        kb = kk.reshape(NG, GRP)[:, ::8][:, :n_sub]
        payload = jnp.concatenate(
            [ray_of_grp[:, None],
             jax.lax.bitcast_convert_type(bits, jnp.int32)[:, None],
             kb,
             jax.lax.bitcast_convert_type(
                 t0_of_grp.astype(jnp.float32), jnp.int32)[:, None],
             jnp.zeros((NG, 1), jnp.int32)], axis=1)
        staged = jnp.zeros((blocks, 8), jnp.int32).at[tgt].set(
            payload, mode="drop")
        return staged, offsets, counts, total

    @jax.jit
    def upto_bits(occ, t0):
        occ_g = occ.reshape(NG, GRP)
        lane_w = (jnp.uint32(1) << jnp.arange(GRP, dtype=jnp.uint32))
        bits = (occ_g.astype(jnp.uint32) * lane_w[None, :]).sum(
            axis=1, dtype=jnp.uint32)
        return bits.sum()
    timeit("compact: bits packing only", upto_bits, occ0, t0v)

    @jax.jit
    def upto_stage1(occ, t0):
        staged, offsets, counts, total = stage1(occ, t0)
        return staged.sum() + total
    timeit("compact: stage1 (scatter descriptors)", upto_stage1, occ0, t0v)

    @jax.jit
    def full_c(occ, t0):
        from ngp_pl_tpu.ops.ray_march import _compact_to_pool
        out = _compact_to_pool(occ, kk, t0, N, K, max_samples, pool_size,
                               0.0, dt_min, dt_max)
        return out[0].sum() + out[6]
    timeit("compact: full", full_c, occ0, t0v)

    # stage 2 in isolation (feed stage1 outputs as inputs)
    staged, offsets, counts, total = jax.jit(stage1)(occ0, t0v)
    staged = jax.block_until_ready(staged)

    @jax.jit
    def stage2(staged, offsets, counts, total, t0):
        s_bits = jax.lax.bitcast_convert_type(staged[:, 1], jnp.uint32)
        cnt_b = jax.lax.population_count(s_bits).astype(jnp.int32)
        start_b = jnp.cumsum(cnt_b) - cnt_b
        b_ids = jnp.arange(blocks, dtype=jnp.int32)
        mark_ok = (cnt_b > 0) & (start_b < P)
        mtgt = jnp.where(mark_ok, start_b, P)
        b_of = jax.lax.cummax(
            jnp.zeros((P,), jnp.int32).at[mtgt].max(b_ids, mode="drop"))
        start_of = jax.lax.cummax(
            jnp.zeros((P,), jnp.int32).at[mtgt].max(start_b, mode="drop"))
        rows_p = staged[b_of]
        return rows_p.sum() + start_of[-1]
    timeit("compact: stage2 (cummax + row gather)", stage2, staged, offsets,
           counts, total, t0v)


if __name__ == "__main__":
    main()
    compact_bisect()
