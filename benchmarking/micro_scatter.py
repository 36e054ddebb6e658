#!/usr/bin/env python
"""Scatter structure micros for the level-paired table design:
- 4 x N scatters of 256-lane f32 rows (pairing) vs 8 x N of 128-lane
- does an OOB-dropped row cost scatter time? (run-dedup feasibility)
- does duplicate-index rate change scatter speed?
- hierarchical (two-pass reshape) cumsum vs jnp.cumsum at pool size
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
    print(f"{name:52s} {(time.time()-t0)/n*1e3:8.2f} ms",
          file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    N = 196608
    R = 16384

    # baseline: 8 per-level scatters, 128-lane f32
    d128 = jnp.asarray(rng.random((8, N, 128)), jnp.float32)
    slots8 = jnp.asarray(rng.integers(0, R, (8, N)), jnp.int32)

    @jax.jit
    def s8(slots8, d128):
        return sum(
            (jnp.zeros((R, 128), jnp.float32).at[slots8[l]].add(d128[l])).sum()
            for l in range(8))
    timeit("8 x N x 128-lane f32 scatters", s8, slots8, d128)

    # paired: 4 scatters of 256-lane rows
    d256 = jnp.asarray(rng.random((4, N, 256)), jnp.float32)
    slots4 = slots8[:4]

    @jax.jit
    def s4(slots4, d256):
        return sum(
            (jnp.zeros((R, 256), jnp.float32).at[slots4[p]].add(d256[p])).sum()
            for p in range(4))
    timeit("4 x N x 256-lane f32 scatters (paired)", s4, slots4, d256)

    d256b = d256.astype(jnp.bfloat16)

    @jax.jit
    def s4b(slots4, d256b):
        return sum(
            (jnp.zeros((R, 256), jnp.float32).at[slots4[p]]
             .add(d256b[p].astype(jnp.float32))).sum()
            for p in range(4))
    timeit("4 x N x 256-lane bf16-in scatters (paired)", s4b, slots4, d256b)

    # OOB-drop fraction: same N rows, but x% point out of range
    d1 = d128[0]
    for frac in (0.0, 0.5, 0.875):
        sl = np.asarray(slots8[0])
        k = int(N * frac)
        sl2 = sl.copy()
        sl2[:k] = R + 5          # out of range -> dropped
        sl2 = jnp.asarray(sl2)

        @jax.jit
        def sd(sl2, d1):
            return (jnp.zeros((R, 128), jnp.float32)
                    .at[sl2].add(d1, mode="drop")).sum()
        timeit(f"1 x N x 128 scatter, {int(frac*100)}% OOB-dropped", sd,
               sl2, d1)

    # duplicate-index rate: all-unique-ish vs runs of 8 vs runs of 64
    for run in (1, 8, 64):
        sl = np.repeat(
            rng.integers(0, R, N // run), run).astype(np.int32)
        sl = jnp.asarray(sl)

        @jax.jit
        def sr(sl, d1):
            return (jnp.zeros((R, 128), jnp.float32).at[sl].add(d1)).sum()
        timeit(f"1 x N x 128 scatter, runs of {run}", sr, sl, d1)

    # pre-combined runs: N/run rows (what dedup would buy)
    for run in (8, 64):
        M = N // run
        slm = jnp.asarray(rng.integers(0, R, M), jnp.int32)
        dm = d1[:M]

        @jax.jit
        def sc(slm, dm):
            return (jnp.zeros((R, 128), jnp.float32).at[slm].add(dm)).sum()
        timeit(f"1 x {M} x 128 scatter (dedup by {run})", sc, slm, dm)

    # cumsum structures at pool scale
    x = jnp.asarray(rng.random(N), jnp.float32)

    @jax.jit
    def cs(x):
        return jnp.cumsum(x).sum()
    timeit("jnp.cumsum (N,)", cs, x)

    @jax.jit
    def cs2(x):
        B = 512
        x2 = x.reshape(B, N // B)
        inner = jnp.cumsum(x2, axis=1)
        carry = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(inner[:, -1])[:-1]])
        return (inner + carry[:, None]).sum()
    timeit("hierarchical cumsum (512 x N/512)", cs2, x)

    xw = jnp.asarray(rng.random((N, 8)), jnp.float32)

    @jax.jit
    def csw(xw):
        return jnp.cumsum(xw, axis=0).sum()
    timeit("jnp.cumsum (N, 8) axis 0", csw, xw)

    @jax.jit
    def csw2(xw):
        B = 512
        x2 = xw.reshape(B, N // B, 8)
        inner = jnp.cumsum(x2, axis=1)
        carry = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.float32),
             jnp.cumsum(inner[:, -1, :], axis=0)[:-1]])
        return (inner + carry[:, None, :]).sum()
    timeit("hierarchical cumsum (N, 8)", csw2, xw)

    # segment_sum vs gather-diff of hierarchical cumsum (composite cost)
    nrays = 8192
    seg = jnp.asarray(np.sort(rng.integers(0, nrays, N)), jnp.int32)

    @jax.jit
    def ss(xw, seg):
        return jax.ops.segment_sum(xw, seg, num_segments=nrays).sum()
    timeit("segment_sum (N, 8) -> 8192", ss, xw, seg)

    offs = jnp.asarray(
        np.searchsorted(np.asarray(seg), np.arange(nrays)), jnp.int32)

    @jax.jit
    def ssd(xw, offs):
        B = 512
        x2 = xw.reshape(B, N // B, 8)
        inner = jnp.cumsum(x2, axis=1)
        carry = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.float32),
             jnp.cumsum(inner[:, -1, :], axis=0)[:-1]])
        cs_full = (inner + carry[:, None, :]).reshape(N, 8)
        zero = jnp.zeros((1, 8), jnp.float32)
        padded = jnp.concatenate([zero, cs_full], axis=0)
        ends = jnp.concatenate([offs[1:], jnp.asarray([N], jnp.int32)])
        return (padded[ends] - padded[offs]).sum()
    timeit("hier-cumsum + boundary-diff segsum", ssd, xw, offs)


if __name__ == "__main__":
    main()
