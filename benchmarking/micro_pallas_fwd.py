#!/usr/bin/env python
"""A/B the packed-f16 encode fwd kernel internals: which term costs —
the f16 decode, the trilinear weight (_wrow incl. meta transpose), the
sel/ft2 dot, or the w1 contraction.  Stripped-variant kernels, same
shapes as the bench hot path (L=8, W=128, N=196608, H=64, bn=4096)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ngp_pl_tpu.ops.hash_encoding_pallas import (
    META_W,
    _wrow,
    f16_bits_to_f32,
    feat_selector,
    lane_table,
)

L, W, H, F = 8, 128, 64, 4
N, bn = 196608, 4096
Wh = W // 2


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
    print(f"{name:44s} {(time.time()-t0)/n*1e3:8.2f} ms",
          file=sys.stderr, flush=True)


def make_variant(body):
    tab = lane_table(F, W)
    sel = feat_selector(F, W)

    def call(rows, meta_T, w1big):
        grid = (N // bn, L)
        h1p, ft2 = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bn, Wh), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, META_W, bn), lambda n, l: (l, 0, n)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, H), lambda n, l: (n, 0)),
                pl.BlockSpec((1, F, bn), lambda n, l: (l, 0, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H), jnp.float32),
                jax.ShapeDtypeStruct((L, F, N), jnp.float32),
            ],
        )(rows, meta_T, w1big,
          jnp.asarray(tab[:, :Wh]), jnp.asarray(tab[:, Wh:]),
          jnp.asarray(sel[:Wh]), jnp.asarray(sel[Wh:]))
        return h1p.sum() + ft2.sum()

    return jax.jit(call)


def full_kernel(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo, sel_hi,
                h1_ref, ft_ref):
    l = pl.program_id(1)
    wrow_lo = _wrow(meta_ref[0], tab_lo, False)
    wrow_hi = _wrow(meta_ref[0], tab_hi, False)
    u = rows_ref[0]
    wr_lo = (f16_bits_to_f32(u) * wrow_lo).astype(jnp.bfloat16)
    wr_hi = (f16_bits_to_f32(u >> jnp.uint32(16)) * wrow_hi).astype(
        jnp.bfloat16)
    ft_ref[0] = (
        jax.lax.dot_general(sel_lo[...].astype(jnp.bfloat16), wr_lo,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel_hi[...].astype(jnp.bfloat16), wr_hi,
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))
    w1 = w1_ref[0]
    acc = (jnp.dot(wr_lo, w1[:Wh].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + jnp.dot(wr_hi, w1[Wh:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32))

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += acc


def no_decode_kernel(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo,
                     sel_hi, h1_ref, ft_ref):
    """decode replaced by a bitcast (measures decode cost)."""
    l = pl.program_id(1)
    wrow_lo = _wrow(meta_ref[0], tab_lo, False)
    wrow_hi = _wrow(meta_ref[0], tab_hi, False)
    u = rows_ref[0]
    f = jax.lax.bitcast_convert_type(u, jnp.float32)
    wr_lo = (f * wrow_lo).astype(jnp.bfloat16)
    wr_hi = (f * wrow_hi).astype(jnp.bfloat16)
    ft_ref[0] = (
        jax.lax.dot_general(sel_lo[...].astype(jnp.bfloat16), wr_lo,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel_hi[...].astype(jnp.bfloat16), wr_hi,
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))
    w1 = w1_ref[0]
    acc = (jnp.dot(wr_lo, w1[:Wh].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + jnp.dot(wr_hi, w1[Wh:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32))

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += acc


def no_wrow_kernel(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo,
                   sel_hi, h1_ref, ft_ref):
    """wrow == 1 (measures _wrow incl. the meta transpose)."""
    l = pl.program_id(1)
    u = rows_ref[0]
    wr_lo = f16_bits_to_f32(u).astype(jnp.bfloat16)
    wr_hi = f16_bits_to_f32(u >> jnp.uint32(16)).astype(jnp.bfloat16)
    ft_ref[0] = (
        jax.lax.dot_general(sel_lo[...].astype(jnp.bfloat16), wr_lo,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel_hi[...].astype(jnp.bfloat16), wr_hi,
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))
    w1 = w1_ref[0]
    acc = (jnp.dot(wr_lo, w1[:Wh].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + jnp.dot(wr_hi, w1[Wh:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32))

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += acc


def no_ft_kernel(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo,
                 sel_hi, h1_ref, ft_ref):
    """skip the sel/ft2 dot (measures its cost)."""
    l = pl.program_id(1)
    wrow_lo = _wrow(meta_ref[0], tab_lo, False)
    wrow_hi = _wrow(meta_ref[0], tab_hi, False)
    u = rows_ref[0]
    wr_lo = (f16_bits_to_f32(u) * wrow_lo).astype(jnp.bfloat16)
    wr_hi = (f16_bits_to_f32(u >> jnp.uint32(16)) * wrow_hi).astype(
        jnp.bfloat16)
    ft_ref[0] = jnp.zeros_like(ft_ref[0])
    w1 = w1_ref[0]
    acc = (jnp.dot(wr_lo, w1[:Wh].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + jnp.dot(wr_hi, w1[Wh:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32))

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += acc


def stream_kernel(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo,
                  sel_hi, h1_ref, ft_ref):
    """pure streaming floor: touch rows once, no math."""
    l = pl.program_id(1)
    u = rows_ref[0]
    s = jax.lax.bitcast_convert_type(u, jnp.float32)

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += s[:, :H]
    ft_ref[0] = jnp.zeros_like(ft_ref[0])


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, 2**31, (L, N, Wh), dtype=np.int64).astype(np.uint32))
    meta_T = jnp.asarray(rng.random((L, META_W, N)), jnp.float32)
    w1big = jnp.asarray(rng.random((L, W, H)), jnp.float32)

    for name, body in [
        ("full (current)", full_kernel),
        ("no f16 decode", no_decode_kernel),
        ("no wrow/meta", no_wrow_kernel),
        ("no ft2 dot", no_ft_kernel),
        ("stream floor", stream_kernel),
    ]:
        timeit(name, make_variant(body), rows, meta_T, w1big)


if __name__ == "__main__":
    main()


def make_variant_bn(body, bn2):
    tab = lane_table(F, W)
    sel = feat_selector(F, W)

    def call(rows, meta_T, w1big):
        grid = (N // bn2, L)
        h1p, ft2 = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bn2, Wh), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, META_W, bn2), lambda n, l: (l, 0, n)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn2, H), lambda n, l: (n, 0)),
                pl.BlockSpec((1, F, bn2), lambda n, l: (l, 0, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H), jnp.float32),
                jax.ShapeDtypeStruct((L, F, N), jnp.float32),
            ],
        )(rows, meta_T, w1big,
          jnp.asarray(tab[:, :Wh]), jnp.asarray(tab[:, Wh:]),
          jnp.asarray(sel[:Wh]), jnp.asarray(sel[Wh:]))
        return h1p.sum() + ft2.sum()

    return jax.jit(call)


def make_variant_interleaved(body, bn2):
    """rows pre-arranged (N//bn, L, bn, Wh): consecutive grid steps
    (l fastest) read CONTIGUOUS HBM."""
    tab = lane_table(F, W)
    sel = feat_selector(F, W)

    def call(rows_il, meta_T, w1big):
        grid = (N // bn2, L)
        h1p, ft2 = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bn2, Wh), lambda n, l: (n, l, 0, 0)),
                pl.BlockSpec((1, META_W, bn2), lambda n, l: (l, 0, n)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((8, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn2, H), lambda n, l: (n, 0)),
                pl.BlockSpec((1, F, bn2), lambda n, l: (l, 0, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H), jnp.float32),
                jax.ShapeDtypeStruct((L, F, N), jnp.float32),
            ],
        )(rows_il, meta_T, w1big,
          jnp.asarray(tab[:, :Wh]), jnp.asarray(tab[:, Wh:]),
          jnp.asarray(sel[:Wh]), jnp.asarray(sel[Wh:]))
        return h1p.sum() + ft2.sum()

    return jax.jit(call)


def full_kernel_il(rows_ref, meta_ref, w1_ref, tab_lo, tab_hi, sel_lo,
                   sel_hi, h1_ref, ft_ref):
    l = pl.program_id(1)
    wrow_lo = _wrow(meta_ref[0], tab_lo, False)
    wrow_hi = _wrow(meta_ref[0], tab_hi, False)
    u = rows_ref[0, 0]
    wr_lo = (f16_bits_to_f32(u) * wrow_lo).astype(jnp.bfloat16)
    wr_hi = (f16_bits_to_f32(u >> jnp.uint32(16)) * wrow_hi).astype(
        jnp.bfloat16)
    ft_ref[0] = (
        jax.lax.dot_general(sel_lo[...].astype(jnp.bfloat16), wr_lo,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel_hi[...].astype(jnp.bfloat16), wr_hi,
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))
    w1 = w1_ref[0]
    acc = (jnp.dot(wr_lo, w1[:Wh].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + jnp.dot(wr_hi, w1[Wh:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32))

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[...] += acc


def main2():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, 2**31, (L, N, Wh), dtype=np.int64).astype(np.uint32))
    meta_T = jnp.asarray(rng.random((L, META_W, N)), jnp.float32)
    w1big = jnp.asarray(rng.random((L, W, H)), jnp.float32)

    for bn2 in (4096,):
        rows_il = jnp.transpose(
            rows.reshape(L, N // bn2, bn2, Wh), (1, 0, 2, 3)).copy()
        timeit(f"full interleaved bn={bn2}",
               make_variant_interleaved(full_kernel_il, bn2),
               rows_il, meta_T, w1big)
        # gather directly INTO the interleaved layout (transpose indices)
        slot = jnp.asarray(rng.integers(0, 100000, (L, N)), jnp.int32)
        packed = jnp.zeros((100000, Wh), jnp.uint32)

        @jax.jit
        def gth(packed, slot, bn2=bn2):
            sl = jnp.transpose(
                slot.reshape(L, N // bn2, bn2), (1, 0, 2)).reshape(-1)
            return packed[sl].sum()
        timeit(f"gather into interleaved bn={bn2}", gth, packed, slot)


if "MAIN2" in os.environ:
    main2()
