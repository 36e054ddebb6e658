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


if __name__ == "__main__":
    main()
