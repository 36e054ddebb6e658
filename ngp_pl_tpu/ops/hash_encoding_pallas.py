"""Pallas TPU kernels for the fused hash-encode + first-layer contraction.

The XLA version of `hash_encode_mlp` (ops/hash_encoding.py) materializes
several (L, N, 64) HBM intermediates per step — the gathered rows (fp32,
~1 GB at the bench pool size), the trilinear lane-weight tensor, their
product, and in the backward the dual of each.  Round-tripping those through
HBM costs ~2x more than the row gather itself (measured: gather 15 ms,
+weights 13 ms, +contraction 9 ms at N=262144).

These kernels keep everything after the gather in VMEM:

  fwd:  h1[n,:]   = sum_l (rows[l,n,:] * wrow(meta[l,n])) @ w1big[l]
        ft2[:,m]  = per-level encoded features (residual: dL/dw1 = ft2 g)
  bwd:  d_rows[l,n,:] = (g[n,:] @ w1big[l].T) * wrow(meta[l,n])

where `meta[l,n] = local + frac` per axis (3 scalars), and the trilinear
lane weight factorizes into per-axis hat functions over the static per-lane
corner coordinates:  w_axis(lane) = max(0, 1 - |c_axis(lane) - p_axis|)
(for local in {0,1}, frac in [0,1) this reproduces the
(c==local)(1-frac) + (c==local+1)frac form of ops/hash_encoding.py).
The per-lane corner coordinates and the feature-channel selector are passed
in as tiny constant-indexed inputs (fetched into VMEM once), keeping iota /
integer div-mod chains out of the per-block body.

Layout rules (v5e-measured): a narrow MINOR dimension is lane-padded to 128,
so a (L, N, 4) fp32 tensor physically occupies 32x its logical bytes and
streaming it through a kernel costs a gigabyte, not 67 MB.  Everything small
therefore travels TRANSPOSED with N on the lane axis:

  meta_T (L, dup*4, N/dup)  — p-values, built by the caller in one pass
  ft2    (L*dup*F, N/dup)   — per-level features residual (kernel output)

Layout: F=2 brick rows are 64 floats — half a native 128-lane tile — so all
tensors are processed as PAIRS of samples per 128-lane row (a free row-major
reshape (N, 64) -> (N/2, 128)), and the first-layer weight becomes a
block-diagonal (128, 2H) matrix so one full-width MXU dot contracts both
samples at once.  F=4 rows are 108 floats padded to 128 — already a full
tile — and use the single-sample kernel path.

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
import numpy as np
from jax.experimental import pallas as pl

LANE_W = 64          # brick-row width for F=2 (ops/hash_encoding.py ROW_PAD)
N_PTS = 27           # 3x3x3 corner points per brick
META_W = 4           # (px, py, pz, pad) per sample; paired rows use 8 lanes


# -- packed-f16 table rows ---------------------------------------------------
# The row gather is the encoder's dominant HBM term and is BANDWIDTH-bound.
# A plain f16 compute copy halves it, but Mosaic has no f16 type and an
# XLA-side f16->f32 cast materializes the full f32 tensor at the custom-call
# boundary (measured slower than gathering f32).  Instead the table copy is
# SWIZZLED into u32 lanes — u32 lane j = f16(row[j]) | f16(row[j + W/2])<<16
# — gathered as (.., W/2) u32 rows, and decoded to two f32 half-rows with
# integer lane math INSIDE the kernel (no cross-lane shuffles: halves keep
# their lane order).  f16's 10-bit mantissa is tinycudann's table precision
# (reference networks.py:36-56); bf16's 8 bits measurably break quality.


def pack_table_f16(table: jnp.ndarray) -> jnp.ndarray:
    """(R, W) f32 table -> (R, W/2) uint32 of swizzled f16 bit pairs."""
    W = table.shape[-1]
    # clamp to the f16 finite range: an overflowing weight would become inf
    # whose bits the branchless decoder (e==31 unhandled) reads as ~2^16
    table = jnp.clip(table, -65504.0, 65504.0)
    bits = jax.lax.bitcast_convert_type(
        table.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    return bits[:, : W // 2] | (bits[:, W // 2:] << jnp.uint32(16))


def f16_bits_to_f32(h: jnp.ndarray) -> jnp.ndarray:
    """u32 holding f16 bits in the low 16 -> f32 value (branchless;
    handles subnormals, which matter here: the table init is U(-1e-4, 1e-4)
    and f16's smallest normal is 6.1e-5)."""
    h = h & jnp.uint32(0xFFFF)
    s = h >> jnp.uint32(15)
    e = (h >> jnp.uint32(10)) & jnp.uint32(0x1F)
    m = h & jnp.uint32(0x3FF)
    normal = jax.lax.bitcast_convert_type(
        (s << jnp.uint32(31)) | ((e + jnp.uint32(112)) << jnp.uint32(23))
        | (m << jnp.uint32(13)), jnp.float32)
    # Mosaic has no u32 -> f32 cast; both values fit int32 exactly
    sign = 1.0 - 2.0 * s.astype(jnp.int32).astype(jnp.float32)
    sub = (m.astype(jnp.int32).astype(jnp.float32)
           * jnp.float32(2.0 ** -24) * sign)
    # e == 31 (inf/nan) cannot occur: table values stay far below 65504
    return jnp.where(e == 0, sub, normal)


def lane_table(F: int, W: int, dup: int = 1) -> np.ndarray:
    """(8, W) f32 per-lane constants [cx, cy, cz, valid, hi, 0, 0, 0] of the
    brick-row corner layout; dup=2 tiles two samples per row (paired F=2
    layout) and `hi` marks the odd sample's lanes."""
    Ws = W // dup
    lane = np.arange(W)
    sub = lane % Ws
    pidx = np.minimum(sub // F, N_PTS - 1)
    tab = np.stack([
        (pidx // 9).astype(np.float32),
        ((pidx // 3) % 3).astype(np.float32),
        (pidx % 3).astype(np.float32),
        (sub < N_PTS * F).astype(np.float32),
        (lane >= Ws).astype(np.float32) if dup == 2
        else np.zeros(W, np.float32),
        np.zeros(W, np.float32),
        np.zeros(W, np.float32),
        np.zeros(W, np.float32),
    ])
    return tab


def feat_selector(F: int, W: int, dup: int = 1) -> np.ndarray:
    """(W, dup*F) 0/1 matrix summing valid lanes of each feature channel."""
    Ws = W // dup
    sel = np.zeros((W, dup * F), np.float32)
    for lane in range(W):
        d, s = divmod(lane, Ws)
        if s < N_PTS * F:
            sel[lane, d * F + s % F] = 1.0
    return sel


def unpack_feats(ft2: jnp.ndarray, L: int, F: int, dup: int) -> jnp.ndarray:
    """(L, dup*F, N/dup) packed features -> (L, N, F)."""
    M = ft2.shape[-1]
    return ft2.reshape(L, dup, F, M).transpose(0, 3, 1, 2).reshape(
        L, M * dup, F)


PT_PAD = 32      # 27 corner points padded to a sublane multiple


def point_expand_halves(F: int, W: int):
    """Static (PT_PAD, W/2) 0/1 expanders: E_half[p, lane] = 1 iff lane
    `lane` of that half-row carries point p (rows 27..31 are dead padding).

    wrow_half = w27^T E_half as one tiny MXU contraction — the per-point
    trilinear weights are computed TRANSPOSED as (PT_PAD, rb) (27 sublanes
    instead of W lanes: ~5x fewer VPU element-ops than evaluating the hat
    functions per lane) and expanded to lane layout by the matmul."""
    Wh = W // 2
    E_lo = np.zeros((PT_PAD, Wh), np.float32)
    E_hi = np.zeros((PT_PAD, Wh), np.float32)
    for lane in range(Wh):
        p = lane // F
        if p < N_PTS:
            E_lo[p, lane] = 1.0
        p2 = (lane + Wh) // F
        if p2 < N_PTS:
            E_hi[p2, lane] = 1.0
    return E_lo, E_hi


def _w27(meta_blk):
    """meta (4|8, rb) p-values -> (PT_PAD, rb) per-point trilinear weights
    (transposed layout; rows >= 27 zero).  No meta transpose needed: the
    p-values already arrive with samples on the lane axis."""
    px = meta_blk[0:1, :]
    py = meta_blk[1:2, :]
    pz = meta_blk[2:3, :]
    pid = jax.lax.broadcasted_iota(jnp.int32, (PT_PAD, 1), 0)
    cx = (pid // 9).astype(jnp.float32)
    cy = ((pid // 3) % 3).astype(jnp.float32)
    cz = (pid % 3).astype(jnp.float32)
    valid = (pid < N_PTS).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - px))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - py))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(cz - pz))
    return wx * wy * wz * valid


def _expand_w27(w27, e_ref):
    """(PT_PAD, rb) x (PT_PAD, Wh) -> (rb, Wh) lane weights (MXU)."""
    return jax.lax.dot_general(
        w27.astype(jnp.bfloat16), e_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _wrow(meta_blk, tab_ref, paired: bool):
    """meta (8|4, rb) p-values + lane table -> (rb, W) trilinear weights."""
    m2 = jnp.transpose(meta_blk)            # (rb, 8|4)
    cx = tab_ref[0:1, :]
    cy = tab_ref[1:2, :]
    cz = tab_ref[2:3, :]
    valid = tab_ref[3:4, :]
    if paired:
        # lanes [0, W/2) weight the even sample, [W/2, W) the odd one
        hi = tab_ref[4:5, :]
        px = m2[:, 0:1] * (1 - hi) + m2[:, 4:5] * hi
        py = m2[:, 1:2] * (1 - hi) + m2[:, 5:6] * hi
        pz = m2[:, 2:3] * (1 - hi) + m2[:, 6:7] * hi
    else:
        px = m2[:, 0:1]
        py = m2[:, 1:2]
        pz = m2[:, 2:3]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - px))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - py))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(cz - pz))
    return wx * wy * wz * valid


def _fwd_kernel(rows_ref, meta_ref, w1_ref, tab_ref, sel_ref, h1_ref, ft_ref,
                *, paired: bool):
    l = pl.program_id(1)
    wrow = _wrow(meta_ref[0], tab_ref, paired)
    wr = (rows_ref[0] * wrow).astype(jnp.bfloat16)
    # ft block (Fk, rb): contract the lane axis of sel (Wk, Fk) with wr
    ft_ref[0] = jax.lax.dot_general(
        sel_ref[...].astype(jnp.bfloat16), wr,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = jnp.dot(wr, w1_ref[0].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    @pl.when(l == 0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)

    h1_ref[...] += acc


def _fwd_kernel_packed(rows_ref, meta_ref, w1_ref, e_lo_ref, e_hi_ref,
                       sel_lo_ref, sel_hi_ref, h1_ref, ft_ref):
    """Packed-f16 rows variant (W == 128, unpaired): rows arrive as
    (rb, W/2) u32 swizzled bit pairs; each half-row decodes in place and
    contracts against its half of w1/sel — no cross-lane shuffles.
    Trilinear weights are computed per POINT transposed (27 sublanes) and
    expanded to lanes with a tiny MXU dot (see point_expand_halves)."""
    l = pl.program_id(1)
    Wh = rows_ref.shape[-1]
    w27 = _w27(meta_ref[0])
    wrow_lo = _expand_w27(w27, e_lo_ref)                  # (rb, W/2)
    wrow_hi = _expand_w27(w27, e_hi_ref)
    u = rows_ref[0]
    wr_lo = (f16_bits_to_f32(u) * wrow_lo).astype(jnp.bfloat16)
    wr_hi = (f16_bits_to_f32(u >> jnp.uint32(16))
             * wrow_hi).astype(jnp.bfloat16)
    ft_ref[0] = (
        jax.lax.dot_general(
            sel_lo_ref[...].astype(jnp.bfloat16), wr_lo,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            sel_hi_ref[...].astype(jnp.bfloat16), wr_hi,
            dimension_numbers=(((0,), (1,)), ((), ())),
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


def point_expand_full(F: int, W: int) -> np.ndarray:
    """(PT_PAD, W) 0/1 expander for the full-width row (unpaired)."""
    E = np.zeros((PT_PAD, W), np.float32)
    for lane in range(W):
        p = lane // F
        if p < N_PTS:
            E[p, lane] = 1.0
    return E


def _bwd_kernel_w27(meta_ref, w1_ref, g_ref, e_ref, drows_ref):
    """Unpaired backward with the transposed-w27 weight path."""
    wrow = _expand_w27(_w27(meta_ref[0]), e_ref)          # (rb, W)
    d_wr = jax.lax.dot_general(
        g_ref[...].astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    drows_ref[0] = (d_wr * wrow).astype(jnp.bfloat16)


def _bwd_kernel(meta_ref, w1_ref, g_ref, tab_ref, drows_ref, *, paired: bool):
    wrow = _wrow(meta_ref[0], tab_ref, paired)
    # d_wr = g @ w1big[l]^T (paired: g-pairs @ block-diag^T), contract H
    d_wr = jax.lax.dot_general(
        g_ref[...].astype(jnp.bfloat16), w1_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # bf16 output: halves the (L, N, W) d_rows HBM traffic feeding the
    # per-level table scatters; per-sample gradient contributions tolerate
    # bf16 rounding (the scatter accumulates into an f32 target)
    drows_ref[0] = (d_wr * wrow).astype(jnp.bfloat16)


def make_w1_dbl(w1big: jnp.ndarray) -> jnp.ndarray:
    """(L, W, H) -> (L, 2W, 2H) block-diagonal: diag(w1big[l], w1big[l])."""
    L, W, H = w1big.shape
    z = jnp.zeros_like(w1big)
    top = jnp.concatenate([w1big, z], axis=2)
    bot = jnp.concatenate([z, w1big], axis=2)
    return jnp.concatenate([top, bot], axis=1)


@functools.partial(jax.jit, static_argnames=("F", "bn", "interpret"))
def encode_mlp_fwd_pallas(rows, meta_T, w1big, *, F: int, bn: int = 4096,
                          interpret: bool = False):
    """rows (L, N, W) f32 — or (L, N, W/2) uint32 packed-f16 pairs from
    `pack_table_f16` (W == 128 only) — meta_T (L, dup*4, N/dup) f32,
    w1big (L, W, H) f32
    -> h1 (N, H) f32, ft2 (L, dup*F, N/dup) f32 packed per-level features
    (the residual for dL/dw1; unpack with `unpack_feats`).  N % bn == 0.
    """
    packed = rows.dtype == jnp.uint32
    L, N = rows.shape[0], rows.shape[1]
    W = w1big.shape[1]
    H = w1big.shape[-1]
    assert N % bn == 0 and bn % 2 == 0, (N, W, bn)
    grid = (N // bn, L)
    if packed:
        assert W == 2 * rows.shape[-1] and W != LANE_W, (W, rows.shape)
        Wh, rb = W // 2, bn
        e_lo, e_hi = point_expand_halves(F, W)
        sel = feat_selector(F, W)
        h1p, ft2 = pl.pallas_call(
            _fwd_kernel_packed,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rb, Wh), lambda n, l: (l, n, 0)),
                pl.BlockSpec((1, META_W, rb), lambda n, l: (l, 0, n)),
                pl.BlockSpec((1, W, H), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((PT_PAD, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((PT_PAD, Wh), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
                pl.BlockSpec((Wh, F), lambda n, l: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((rb, H), lambda n, l: (n, 0)),
                pl.BlockSpec((1, F, rb), lambda n, l: (l, 0, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H), jnp.float32),
                jax.ShapeDtypeStruct((L, F, N), jnp.float32),
            ],
            interpret=interpret,
        )(rows, meta_T, w1big,
          jnp.asarray(e_lo), jnp.asarray(e_hi),
          jnp.asarray(sel[:Wh]), jnp.asarray(sel[Wh:]))
        return h1p.reshape(N, H), ft2
    paired = W == LANE_W
    dup = 2 if paired else 1
    rb, Wk, Hk, Fk = bn // dup, dup * W, dup * H, dup * F
    rows_k = rows.reshape(L, N // dup, Wk)
    w1_k = make_w1_dbl(w1big) if paired else w1big
    tab = jnp.asarray(lane_table(F, Wk, dup))
    sel = jnp.asarray(feat_selector(F, Wk, dup))
    h1p, ft2 = pl.pallas_call(
        functools.partial(_fwd_kernel, paired=paired),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, Wk), lambda n, l: (l, n, 0)),
            pl.BlockSpec((1, dup * META_W, rb), lambda n, l: (l, 0, n)),
            pl.BlockSpec((1, Wk, Hk), lambda n, l: (l, 0, 0)),
            pl.BlockSpec((8, Wk), lambda n, l: (0, 0)),
            pl.BlockSpec((Wk, Fk), lambda n, l: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rb, Hk), lambda n, l: (n, 0)),
            pl.BlockSpec((1, Fk, rb), lambda n, l: (l, 0, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // dup, Hk), jnp.float32),
            jax.ShapeDtypeStruct((L, Fk, N // dup), jnp.float32),
        ],
        interpret=interpret,
    )(rows_k, meta_T, w1_k, tab, sel)
    return h1p.reshape(N, H), ft2


@functools.partial(jax.jit, static_argnames=("F", "bn", "interpret"))
def encode_mlp_bwd_pallas(meta_T, w1big, g, *, F: int, bn: int = 4096,
                          interpret: bool = False):
    """meta_T (L, dup*4, N/dup), w1big (L, W, H), g (N, H)
    -> d_rows (L, N, W) bf16 (accumulated into the f32 table by the
    caller's per-level scatters).

    The g block is indexed by n only, so the L consecutive inner grid steps
    reuse one fetched block."""
    L = meta_T.shape[0]
    W, H = w1big.shape[1], w1big.shape[2]
    paired = W == LANE_W
    dup = 2 if paired else 1
    N = meta_T.shape[-1] * dup
    assert N % bn == 0 and bn % 2 == 0, (N, W, bn)
    rb, Wk, Hk = bn // dup, dup * W, dup * H
    g_k = g.reshape(N // dup, Hk)
    w1_k = make_w1_dbl(w1big) if paired else w1big
    grid = (N // bn, L)
    if not paired:
        drows = pl.pallas_call(
            _bwd_kernel_w27,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, META_W, rb), lambda n, l: (l, 0, n)),
                pl.BlockSpec((1, Wk, Hk), lambda n, l: (l, 0, 0)),
                pl.BlockSpec((rb, Hk), lambda n, l: (n, 0)),
                pl.BlockSpec((PT_PAD, Wk), lambda n, l: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rb, Wk), lambda n, l: (l, n, 0)),
            out_shape=jax.ShapeDtypeStruct((L, N, Wk), jnp.bfloat16),
            interpret=interpret,
        )(meta_T, w1_k, g_k, jnp.asarray(point_expand_full(F, Wk)))
        return drows
    tab = jnp.asarray(lane_table(F, Wk, dup))
    drows = pl.pallas_call(
        functools.partial(_bwd_kernel, paired=paired),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dup * META_W, rb), lambda n, l: (l, 0, n)),
            pl.BlockSpec((1, Wk, Hk), lambda n, l: (l, 0, 0)),
            pl.BlockSpec((rb, Hk), lambda n, l: (n, 0)),
            pl.BlockSpec((8, Wk), lambda n, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, Wk), lambda n, l: (l, n, 0)),
        out_shape=jax.ShapeDtypeStruct((L, N // dup, Wk), jnp.bfloat16),
        interpret=interpret,
    )(meta_T, w1_k, g_k, tab)
    return drows.reshape(L, N, W)
