"""Pallas TPU kernels for the fused hash-encode + first-layer contraction.

The XLA version of `hash_encode_mlp` (ops/hash_encoding.py) materializes
several (L, N, 64) HBM intermediates per step — the gathered rows (fp32,
~1 GB at the bench pool size), the trilinear lane-weight tensor, their
product, and in the backward the dual of each.  Round-tripping those through
HBM costs ~2x more than the row gather itself (measured: gather 15 ms,
+weights 13 ms, +contraction 9 ms at N=262144).

These kernels keep everything after the gather in VMEM:

  fwd:  h1[n,:]   = sum_l (rows[l,n,:] * wrow(meta[l,n])) @ w1big[l]
        wr[l,n,:] = rows[l,n,:] * wrow(meta[l,n])          (residual, bf16)
  bwd:  d_rows[l,n,:] = (g[n,:] @ w1big[l].T) * wrow(meta[l,n])

where `meta[l,n] = local + frac` per axis (3 scalars), and the trilinear
lane weight factorizes into per-axis hat functions over the static per-lane
corner coordinates:  w_axis(lane) = max(0, 1 - |c_axis(lane) - p_axis|)
(for local in {0,1}, frac in [0,1) this reproduces the
(c==local)(1-frac) + (c==local+1)frac form of ops/hash_encoding.py).

Layout: the brick row width is 64 — half a native 128-lane tile — so all
tensors are processed as PAIRS of samples per 128-lane row (a free row-major
reshape (N, 64) -> (N/2, 128)), and the first-layer weight becomes a
block-diagonal (128, 2H) matrix so one full-width MXU dot contracts both
samples at once.

The row gather itself and the per-level table scatter-add stay in XLA — the
TPU has no per-lane gather hardware, so XLA's row-gather DMA path is already
the fast path; only the elementwise/contraction pipeline around it benefits
from manual fusion.

Replaces tinycudann's fused hash-grid + first MLP layer (reference
models/networks.py:36-56) on the TPU execution path; tests compare against
the XLA path which is itself validated against an explicit 8-corner gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE_W = 64          # brick-row width (ops/hash_encoding.py ROW_PAD)
N_PTS = 27           # 3x3x3 corner points per brick
META_W = 4           # (px, py, pz, pad) per sample; paired rows use 8 lanes


def _wrow_pair(meta_blk, F: int, bn2: int):
    """(bn2, 8) paired p-values -> (bn2, 128) trilinear lane weights.

    Lanes 0-63 weight the even sample of the pair (meta lanes 0-2), lanes
    64-127 the odd sample (meta lanes 4-6)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn2, 2 * LANE_W), 1)
    sub = lane % LANE_W
    hi = lane >= LANE_W
    pidx = jnp.minimum(sub // F, N_PTS - 1)
    cx = (pidx // 9).astype(jnp.float32)
    cy = ((pidx // 3) % 3).astype(jnp.float32)
    cz = (pidx % 3).astype(jnp.float32)
    valid = (sub < N_PTS * F).astype(jnp.float32)
    px = jnp.where(hi, meta_blk[:, 4:5], meta_blk[:, 0:1])
    py = jnp.where(hi, meta_blk[:, 5:6], meta_blk[:, 1:2])
    pz = jnp.where(hi, meta_blk[:, 6:7], meta_blk[:, 2:3])
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - px))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - py))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(cz - pz))
    return wx * wy * wz * valid


def _wrow_single(meta_blk, F: int, W: int, bn: int):
    """(bn, META_W) p-values -> (bn, W) trilinear lane weights (one sample
    per row; used for F=4 whose 108-float rows already fill a 128-lane tile).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, W), 1)
    pidx = jnp.minimum(lane // F, N_PTS - 1)
    cx = (pidx // 9).astype(jnp.float32)
    cy = ((pidx // 3) % 3).astype(jnp.float32)
    cz = (pidx % 3).astype(jnp.float32)
    valid = (lane < N_PTS * F).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - meta_blk[:, 0:1]))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - meta_blk[:, 1:2]))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(cz - meta_blk[:, 2:3]))
    return wx * wy * wz * valid


def _fwd_kernel_single(rows_ref, meta_ref, w1_ref, h1_ref, wr_ref, *, F: int):
    l = pl.program_id(1)
    bn, W = rows_ref.shape[1], rows_ref.shape[2]
    wrow = _wrow_single(meta_ref[0], F, W, bn)
    wr = (rows_ref[0] * wrow).astype(jnp.bfloat16)
    wr_ref[0] = wr
    acc = jnp.dot(wr, w1_ref[0].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)

    h1_ref[...] += acc


def _bwd_kernel_single(meta_ref, w1_ref, g_ref, drows_ref, *, F: int):
    bn, W = drows_ref.shape[1], drows_ref.shape[2]
    wrow = _wrow_single(meta_ref[0], F, W, bn)
    d_wr = jax.lax.dot_general(
        g_ref[...].astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    drows_ref[0] = d_wr * wrow


def _fwd_kernel(rows_ref, meta_ref, w1_ref, h1_ref, wr_ref, *, F: int):
    l = pl.program_id(1)
    bn2 = rows_ref.shape[1]
    wrow = _wrow_pair(meta_ref[0], F, bn2)
    wr = (rows_ref[0] * wrow).astype(jnp.bfloat16)
    wr_ref[0] = wr
    # (bn2, 128) @ block-diag (128, 2H) -> (bn2, 2H): both pair members at once
    acc = jnp.dot(wr, w1_ref[0].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)

    h1_ref[...] += acc


def _bwd_kernel(meta_ref, w1_ref, g_ref, drows_ref, *, F: int):
    bn2 = drows_ref.shape[1]
    wrow = _wrow_pair(meta_ref[0], F, bn2)
    # d_wr = g_pairs @ w1dbl^T: (bn2, 2H) x (128, 2H) -> (bn2, 128)
    d_wr = jax.lax.dot_general(
        g_ref[...].astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    drows_ref[0] = d_wr * wrow


def make_w1_dbl(w1big: jnp.ndarray) -> jnp.ndarray:
    """(L, W, H) -> (L, 2W, 2H) block-diagonal: diag(w1big[l], w1big[l])."""
    L, W, H = w1big.shape
    z = jnp.zeros_like(w1big)
    top = jnp.concatenate([w1big, z], axis=2)
    bot = jnp.concatenate([z, w1big], axis=2)
    return jnp.concatenate([top, bot], axis=1)


@functools.partial(jax.jit, static_argnames=("F", "bn", "interpret"))
def encode_mlp_fwd_pallas(rows, meta, w1big, *, F: int, bn: int = 4096,
                          interpret: bool = False):
    """rows (L, N, W) f32, meta (L, N, 4) f32, w1big (L, W, H) f32
    -> h1 (N, H) f32, wr (L, N, W) bf16.  N must be a multiple of bn (even).
    """
    L, N, W = rows.shape
    H = w1big.shape[-1]
    assert N % bn == 0 and bn % 2 == 0, (N, W, bn)
    if W != LANE_W:                    # F=4: rows already fill 128 lanes
        grid = (N // bn, L)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_single, F=F),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bn, W), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, bn, META_W), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, H), lambda n, l: (n, 0)),
                pl.BlockSpec((1, bn, W), lambda n, l: (l, n, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H), jnp.float32),
                jax.ShapeDtypeStruct((L, N, W), jnp.bfloat16),
            ],
            interpret=interpret,
        )(rows, meta, w1big)
    bn2 = bn // 2
    rows_p = rows.reshape(L, N // 2, 2 * W)
    meta_p = meta.reshape(L, N // 2, 2 * META_W)
    w1_dbl = make_w1_dbl(w1big)
    grid = (N // bn, L)
    h1p, wrp = pl.pallas_call(
        functools.partial(_fwd_kernel, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn2, 2 * W), lambda n, l: (l, n, 0)),
            pl.BlockSpec((1, bn2, 2 * META_W), lambda n, l: (l, n, 0)),
            pl.BlockSpec((1, 2 * W, 2 * H), lambda n, l: (l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn2, 2 * H), lambda n, l: (n, 0)),
            pl.BlockSpec((1, bn2, 2 * W), lambda n, l: (l, n, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // 2, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((L, N // 2, 2 * W), jnp.bfloat16),
        ],
        interpret=interpret,
    )(rows_p, meta_p, w1_dbl)
    return h1p.reshape(N, H), wrp.reshape(L, N, W)


@functools.partial(jax.jit, static_argnames=("F", "bn", "interpret"))
def encode_mlp_bwd_pallas(meta, w1big, g, *, F: int, bn: int = 4096,
                          interpret: bool = False):
    """meta (L, N, 4), w1big (L, W, H), g (N, H) -> d_rows (L, N, W) f32.

    The g block is indexed by n only, so the L consecutive inner grid steps
    reuse one fetched block."""
    L, N = meta.shape[0], meta.shape[1]
    W, H = w1big.shape[1], w1big.shape[2]
    assert N % bn == 0 and bn % 2 == 0, (N, W, bn)
    if W != LANE_W:                    # F=4 single-sample rows
        grid = (N // bn, L)
        return pl.pallas_call(
            functools.partial(_bwd_kernel_single, F=F),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bn, META_W), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((bn, H), lambda n, l: (n, 0)),
            ],
            out_specs=pl.BlockSpec((1, bn, W), lambda n, l: (l, n, 0)),
            out_shape=jax.ShapeDtypeStruct((L, N, W), jnp.float32),
            interpret=interpret,
        )(meta, w1big, g)
    bn2 = bn // 2
    meta_p = meta.reshape(L, N // 2, 2 * META_W)
    g_p = g.reshape(N // 2, 2 * H)
    w1_dbl = make_w1_dbl(w1big)
    grid = (N // bn, L)
    drows = pl.pallas_call(
        functools.partial(_bwd_kernel, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn2, 2 * META_W), lambda n, l: (l, n, 0)),
            pl.BlockSpec((1, 2 * W, 2 * H), lambda n, l: (l, 0, 0)),
            pl.BlockSpec((bn2, 2 * H), lambda n, l: (n, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn2, 2 * W), lambda n, l: (l, n, 0)),
        out_shape=jax.ShapeDtypeStruct((L, N // 2, 2 * W), jnp.float32),
        interpret=interpret,
    )(meta_p, w1_dbl, g_p)
    return drows.reshape(L, N, W)
