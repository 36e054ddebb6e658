#!/usr/bin/env python
"""Round-2 micro: where does the fused encode fwd/bwd time go at pool shapes?
Stages: slot math, meta_T build, row gather (f32 vs bf16), pallas fwd kernel,
pallas bwd kernel, per-level scatter."""
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
    _meta_T,
    _slots_local_frac_lm,
    expand_w1,
    init_hash_table,
    make_grid_spec,
)
from ngp_pl_tpu.ops.hash_encoding_pallas import (
    encode_mlp_bwd_pallas,
    encode_mlp_fwd_pallas,
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
    print(f"{name:46s} {dt:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    N = int(os.environ.get("MICRO_N", 262144))
    spec = make_grid_spec(n_levels=8, n_features=4,
                          per_level_scale=1.3819 ** 2)
    L, W = spec.n_levels, spec.row_width
    H = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, 3)), jnp.float32)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    w1 = jnp.asarray(rng.normal(0, 0.1, (spec.out_dim, H)), jnp.float32)
    bn = 4096
    dup = 2 if W == 64 else 1

    @jax.jit
    def slots_only(x):
        slot, local, frac = _slots_local_frac_lm(jnp.clip(x, 0, 1), spec)
        return slot.sum() + local.sum() + frac.sum()
    timeit("slot math (L,N)", slots_only, x)

    @jax.jit
    def meta_only(x):
        _, local, frac = _slots_local_frac_lm(jnp.clip(x, 0, 1), spec)
        return _meta_T(local, frac, dup).sum()
    timeit("slot math + meta_T", meta_only, x)

    slot, local, frac = jax.jit(
        lambda x: _slots_local_frac_lm(jnp.clip(x, 0, 1), spec))(x)
    meta = jax.jit(lambda l, f: _meta_T(l, f, dup))(local, frac)

    @jax.jit
    def gather_f32(t, s):
        return t[s.reshape(-1)].reshape(L, N, W).sum()
    timeit("gather f32", gather_f32, table, slot)

    @jax.jit
    def gather_bf(t, s):
        return t.astype(jnp.bfloat16)[s.reshape(-1)].reshape(L, N, W).sum()
    timeit("cast+gather bf16", gather_bf, table, slot)

    rows_bf = jax.jit(
        lambda t, s: t.astype(jnp.bfloat16)[s.reshape(-1)].reshape(L, N, W)
    )(table, slot)
    w1big = jax.jit(lambda w: expand_w1(w, spec))(w1)

    @jax.jit
    def pl_fwd(rows, meta, w1big):
        h1, ft2 = encode_mlp_fwd_pallas(rows, meta, w1big,
                                        F=spec.n_features, bn=bn)
        return h1.sum() + ft2.sum()
    timeit("pallas fwd kernel (rows pre-gathered)", pl_fwd, rows_bf, meta,
           w1big)

    g = jnp.asarray(rng.normal(0, 1, (N, H)), jnp.float32)

    @jax.jit
    def pl_bwd(meta, w1big, g):
        return encode_mlp_bwd_pallas(meta, w1big, g,
                                     F=spec.n_features, bn=bn).sum()
    timeit("pallas bwd kernel (d_rows)", pl_bwd, meta, w1big, g)

    d_rows = jax.jit(lambda m, w, g: encode_mlp_bwd_pallas(
        m, w, g, F=spec.n_features, bn=bn))(meta, w1big, g)

    @jax.jit
    def scatter_levels(d_rows, slot):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((spec.sizes[l], W), jnp.float32)
                         .at[slot[l] - spec.offsets[l]].add(d_rows[l]))
        return sum(p.sum() for p in parts)
    timeit("per-level scatter-add", scatter_levels, d_rows, slot)

    # dL/dw1 contraction (ft2 residual x g)
    ft2 = jax.jit(lambda r, m, w: encode_mlp_fwd_pallas(
        r, m, w, F=spec.n_features, bn=bn)[1])(rows_bf, meta, w1big)

    @jax.jit
    def dw1(ft2, g):
        M = meta.shape[-1]
        g_k = g.reshape(M, dup * H)
        out2 = jax.lax.dot_general(
            ft2.astype(jnp.bfloat16), g_k.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out2.sum()
    timeit("dL/dw1 contraction", dw1, ft2, g)


if __name__ == "__main__":
    main()
