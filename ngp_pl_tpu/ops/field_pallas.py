"""Pallas TPU kernel for the post-encode field tail.

Fuses everything between the fused hash-encode (ops/hash_encoding.py
`hash_encode_mlp`, which emits the first-layer pre-activation h1) and the
compositor into one VMEM-resident kernel per direction:

  fwd:  x   = relu(h1)                      (bn, 64)
        h   = x @ W2                        (bn, 16)   geometry features
        sigma = exp(h[:, 0])                           (TruncExp fwd)
        z1  = sh @ Wr1[:16] + h @ Wr1[16:]  (bn, 64)   rgb layer 1
        r2  = relu(relu(z1) @ Wr2)          (bn, 64)   rgb layer 2
        rgb = sigmoid(r2 @ Wr3)             (bn, 3)
  bwd:  recompute the forward, backprop to d_h1 and all weight grads,
        accumulated across grid blocks in VMEM.

Replaces ~25 separate XLA HBM passes over (P, 64)-sized fp32 tensors
(measured ~15 ms at P=524288 on the v5e) with one read of h1 + sh and one
(8, P) write.  Mirrors the reference's rgb network + TruncExp
(models/networks.py:67-77, custom_functions.py:162-173); tinycudann fuses
its MLP stack the same way on GPU.

Layout rules: per-sample vectors travel TRANSPOSED with the sample index on
the lane axis — sh as (16, P), outputs as (8, P) rows [sigma, r, g, b] —
because a (P, k<128) fp32 array is lane-padded to (P, 128) in HBM (an 8-32x
read amplification).  Direction gradients are not produced (only camera-pose
refinement consumes them, reference train.py:117-122); callers fall back to
the XLA tail when optimizing extrinsics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H_HID = 64      # hidden width (sigma + rgb MLPs, networks.py:48-77)
H_GEO = 16      # geometry features
H_SH = 16       # SH degree-4 outputs
OUT_ROWS = 8    # [sigma, r, g, b, pad x4]


def _bf(x):
    return x.astype(jnp.bfloat16)


def _dot(a, b):
    return jax.lax.dot_general(
        _bf(a), _bf(b), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a @ b.T with f32 accumulation."""
    return jax.lax.dot_general(
        _bf(a), _bf(b), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a.T @ b with f32 accumulation (weight-grad contraction over bn)."""
    return jax.lax.dot_general(
        _bf(a), _bf(b), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_compute(h1, sh_b, w2_ref, wr1_ref, wr2_ref, wr3_ref):
    x = jnp.maximum(h1, 0.0)
    h = _dot(x, w2_ref[...])                              # (bn, 16)
    z1 = (_dot(sh_b, wr1_ref[:H_SH, :])
          + _dot(h, wr1_ref[H_SH:, :]))                   # (bn, 64)
    r1 = jnp.maximum(z1, 0.0)
    z2 = _dot(r1, wr2_ref[...])
    r2 = jnp.maximum(z2, 0.0)
    z3 = _dot(r2, wr3_ref[...])                           # (bn, 8)
    return x, h, z1, r1, z2, r2, z3


def _fwd_kernel(h1_ref, sh_ref, w2_ref, wr1_ref, wr2_ref, wr3_ref, out_ref):
    sh_b = jnp.transpose(sh_ref[...])                     # (bn, 16)
    x, h, z1, r1, z2, r2, z3 = _fwd_compute(
        h1_ref[...], sh_b, w2_ref, wr1_ref, wr2_ref, wr3_ref)
    # TruncExp fwd with the same +/-30 input clamp as ops/trunc_exp.py —
    # an unclamped logit past ~88.7 overflows f32 exp and poisons training
    sigma = jnp.exp(jnp.clip(h[:, 0:1], -30.0, 30.0))
    rgb = jax.nn.sigmoid(z3[:, :3])
    bn = sigma.shape[0]
    out = jnp.concatenate(
        [sigma, rgb, jnp.zeros((bn, OUT_ROWS - 4), jnp.float32)], axis=1)
    out_ref[...] = jnp.transpose(out)                     # (8, bn)


def _bwd_kernel(h1_ref, sh_ref, g_ref, w2_ref, wr1_ref, wr2_ref, wr3_ref,
                dh1_ref, dw2_ref, dwr1_ref, dwr2_ref, dwr3_ref):
    n = pl.program_id(0)
    h1 = h1_ref[...]
    sh_b = jnp.transpose(sh_ref[...])
    x, h, z1, r1, z2, r2, z3 = _fwd_compute(
        h1, sh_b, w2_ref, wr1_ref, wr2_ref, wr3_ref)
    g = jnp.transpose(g_ref[...])                         # (bn, 8)
    g_sigma = g[:, 0:1]
    rgb = jax.nn.sigmoid(z3[:, :3])
    d_z3 = jnp.concatenate(
        [g[:, 1:4] * rgb * (1.0 - rgb),
         jnp.zeros((g.shape[0], OUT_ROWS - 3), jnp.float32)], axis=1)
    d_r2 = _dot_t(d_z3, wr3_ref[...])
    d_z2 = jnp.where(z2 > 0, d_r2, 0.0)
    d_r1 = _dot_t(d_z2, wr2_ref[...])
    d_z1 = jnp.where(z1 > 0, d_r1, 0.0)
    d_h = _dot_t(d_z1, wr1_ref[H_SH:, :])                 # (bn, 16)
    # TruncExp bwd: clamp the input before re-exponentiating
    d_sig_h0 = g_sigma * jnp.exp(jnp.clip(h[:, 0:1], -15.0, 15.0))
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, d_h.shape, 1) == 0)
    d_h = d_h + jnp.where(lane0, d_sig_h0, 0.0)
    d_x = _dot_t(d_h, w2_ref[...])
    dh1_ref[...] = jnp.where(h1 > 0, d_x, 0.0)

    dw2 = _dot_tn(x, d_h)                                 # (64, 16)
    dwr1 = jnp.concatenate(
        [_dot_tn(sh_b, d_z1), _dot_tn(h, d_z1)], axis=0)  # (32, 64)
    dwr2 = _dot_tn(r1, d_z2)                              # (64, 64)
    dwr3 = _dot_tn(r2, d_z3)                              # (64, 8)

    @pl.when(n == 0)
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dwr1_ref[...] = jnp.zeros_like(dwr1_ref)
        dwr2_ref[...] = jnp.zeros_like(dwr2_ref)
        dwr3_ref[...] = jnp.zeros_like(dwr3_ref)

    dw2_ref[...] += dw2
    dwr1_ref[...] += dwr1
    dwr2_ref[...] += dwr2
    dwr3_ref[...] += dwr3


def _pick_bn(n: int) -> int:
    for bn in (2048, 1024, 512, 256, 128):
        if n % bn == 0:
            return bn
    return 0


def field_tail_supported(cfg) -> bool:
    """Fused tail covers the reference geometry (networks.py:48-77)."""
    return (cfg.rgb_act == "Sigmoid" and cfg.sigma_hidden == H_HID
            and cfg.sigma_layers == 1 and cfg.geo_features == H_GEO
            and cfg.rgb_hidden == H_HID and cfg.rgb_layers == 2
            and cfg.sh_degree == 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def field_tail(bn: int, h1, sh_t, w2, wr1, wr2, wr3p):
    """(sigma+rgb) from first-layer pre-activations, fused.

    Args:
      bn: block size (static; P % bn == 0).
      h1: (P, 64) f32 pre-activations from hash_encode_mlp.
      sh_t: (16, P) f32 SH features, transposed (P on lanes).
      w2: (64, 16) sigma-net layer 2.  wr1: (32, 64).  wr2: (64, 64).
      wr3p: (64, 8) rgb output layer zero-padded from (64, 3).
    Returns: (8, P) f32 rows [sigma, r, g, b, 0, 0, 0, 0].
    """
    return _field_tail_fwd(bn, h1, sh_t, w2, wr1, wr2, wr3p)[0]


def _field_tail_impl(bn, h1, sh_t, w2, wr1, wr2, wr3p, interpret=False):
    P = h1.shape[0]
    grid = (P // bn,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, H_HID), lambda n: (n, 0)),
            pl.BlockSpec((H_SH, bn), lambda n: (0, n)),
            pl.BlockSpec((H_HID, H_GEO), lambda n: (0, 0)),
            pl.BlockSpec((H_SH + H_GEO, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, OUT_ROWS), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((OUT_ROWS, bn), lambda n: (0, n)),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, P), jnp.float32),
        interpret=interpret,
    )(h1, sh_t, w2, wr1, wr2, wr3p)


def _field_tail_fwd(bn, h1, sh_t, w2, wr1, wr2, wr3p):
    out = _field_tail_impl(bn, h1, sh_t, w2, wr1, wr2, wr3p,
                           interpret=_interpret())
    return out, (h1, sh_t, w2, wr1, wr2, wr3p)


def _field_tail_bwd(bn, res, g):
    h1, sh_t, w2, wr1, wr2, wr3p = res
    P = h1.shape[0]
    grid = (P // bn,)
    dh1, dw2, dwr1, dwr2, dwr3 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, H_HID), lambda n: (n, 0)),
            pl.BlockSpec((H_SH, bn), lambda n: (0, n)),
            pl.BlockSpec((OUT_ROWS, bn), lambda n: (0, n)),
            pl.BlockSpec((H_HID, H_GEO), lambda n: (0, 0)),
            pl.BlockSpec((H_SH + H_GEO, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, OUT_ROWS), lambda n: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, H_HID), lambda n: (n, 0)),
            pl.BlockSpec((H_HID, H_GEO), lambda n: (0, 0)),
            pl.BlockSpec((H_SH + H_GEO, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, H_HID), lambda n: (0, 0)),
            pl.BlockSpec((H_HID, OUT_ROWS), lambda n: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, H_HID), jnp.float32),
            jax.ShapeDtypeStruct((H_HID, H_GEO), jnp.float32),
            jax.ShapeDtypeStruct((H_SH + H_GEO, H_HID), jnp.float32),
            jax.ShapeDtypeStruct((H_HID, H_HID), jnp.float32),
            jax.ShapeDtypeStruct((H_HID, OUT_ROWS), jnp.float32),
        ],
        interpret=_interpret(),
    )(h1, sh_t, g, w2, wr1, wr2, wr3p)
    # no gradient to sh (directions feed pose refinement only; callers use
    # the XLA tail when optimizing extrinsics)
    return dh1, jnp.zeros_like(sh_t), dw2, dwr1, dwr2, dwr3


field_tail.defvjp(_field_tail_fwd, _field_tail_bwd)


_FORCE_INTERPRET = False


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() == "cpu"
