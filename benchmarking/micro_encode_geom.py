#!/usr/bin/env python
"""Micro: fused encode fwd / fwd+bwd across table geometries at pool shapes.

(L=16, F=2): reference geometry, 64-float rows, 16 gathers+scatters/sample.
(L=8, F=4): equal-budget TPU variant, 128-float rows (one native tile),
            8 gathers+scatters/sample.
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

from ngp_pl_tpu.ops.hash_encoding import (
    hash_encode_mlp,
    init_hash_table,
    make_grid_spec,
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


def bench_spec(tag, spec, N=262144, H=64):
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    w1 = jax.random.normal(key, (spec.out_dim, H), jnp.float32) * 0.05
    x = jax.random.uniform(key, (N, 3), jnp.float32)
    print(f"{tag}: rows {spec.total_rows} width {spec.row_width} "
          f"({spec.total_rows * spec.row_width * 4 / 1e6:.0f} MB)",
          file=sys.stderr, flush=True)

    @jax.jit
    def fwd(x, table, w1):
        return hash_encode_mlp(x, table, w1, spec, need_x_grad=False).sum()

    @jax.jit
    def grad(x, table, w1):
        def f(t):
            h1 = hash_encode_mlp(x, t, w1, spec, need_x_grad=False)
            return jnp.sin(h1).sum()
        return jax.grad(f)(table).sum()

    timeit(f"{tag} fwd", fwd, x, table, w1)
    timeit(f"{tag} fwd+bwd", grad, x, table, w1)


def main():
    import math

    bench_spec("L16 F2 (reference geom)",
               make_grid_spec(n_levels=16, n_features=2,
                              log2_hashmap_size=19,
                              per_level_scale=1.3819))
    b8 = math.exp(math.log(2048 * 0.5 / 16) / 7)
    bench_spec("L8 F4 (tile rows)",
               make_grid_spec(n_levels=8, n_features=4,
                              log2_hashmap_size=19, per_level_scale=b8))


if __name__ == "__main__":
    main()
