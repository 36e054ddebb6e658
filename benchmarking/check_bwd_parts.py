#!/usr/bin/env python
"""Decompose the encode backward cost at bench shapes."""
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
    _meta_p, _slots_local_frac_lm, expand_w1, init_hash_table, make_grid_spec)
from ngp_pl_tpu.ops.hash_encoding_pallas import (
    encode_mlp_bwd_pallas, encode_mlp_fwd_pallas)


def fence(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, n=20):
    for _ in range(3):
        out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    print(f"{name:44s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)


def main():
    spec = make_grid_spec()
    L, W = spec.n_levels, spec.row_width
    N = 262144
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (spec.out_dim, 64)) * 0.2
    w1big = expand_w1(w1, spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (N, 64))

    slot, local, frac = jax.jit(
        lambda x: _slots_local_frac_lm(jnp.clip(x, 0, 1), spec))(x)
    meta = jax.jit(_meta_p)(local, frac)
    slot = jax.block_until_ready(slot)

    @jax.jit
    def fwd(table, meta, w1big):
        rows = table[slot.reshape(-1)].reshape(L, N, W)
        h1, wr = encode_mlp_fwd_pallas(rows, meta, w1big,
                                       F=spec.n_features, bn=4096)
        return h1.sum(), wr

    _, wr = fwd(table, meta, w1big)
    wr = jax.block_until_ready(wr)

    timeit("pallas fwd (gather+kernel)", lambda: fwd(table, meta, w1big)[0])

    @jax.jit
    def k_bwd(meta, w1big, g):
        return encode_mlp_bwd_pallas(meta, w1big, g,
                                     F=spec.n_features, bn=4096).sum()
    timeit("pallas bwd kernel only", k_bwd, meta, w1big, g)

    @jax.jit
    def dw1(wr, g):
        return jax.lax.dot_general(
            wr, g.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).sum()
    timeit("d_w1big contraction", dw1, wr, g)

    d_rows = jax.jit(lambda m, w, g: encode_mlp_bwd_pallas(
        m, w, g, F=spec.n_features, bn=4096))(meta, w1big, g)
    d_rows = jax.block_until_ready(d_rows)

    @jax.jit
    def scat(slot, d_rows):
        parts = []
        for l in range(L):
            parts.append(
                jnp.zeros((spec.sizes[l], W), jnp.float32)
                .at[slot[l] - spec.offsets[l]].add(d_rows[l]))
        return jnp.concatenate(parts, axis=0).sum()
    timeit("per-level scatter (real slots)", scat, slot, d_rows)

    # scatter from marched-style slots: long runs of repeats
    rng = np.random.default_rng(0)
    slot_coh = []
    for l in range(L):
        run = max(1, int(1176 / spec.resolutions[l]))
        m = N // run + 1
        s = rng.integers(spec.offsets[l], spec.offsets[l] + spec.sizes[l],
                         m, dtype=np.int32)
        slot_coh.append(np.repeat(s, run)[:N])
    slot_coh = jnp.asarray(np.stack(slot_coh))
    timeit("per-level scatter (run-repeated slots)", scat, slot_coh, d_rows)


if __name__ == "__main__":
    main()
