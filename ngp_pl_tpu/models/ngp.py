"""The NGP radiance field: hash encoding + tiny MLPs + SH directions.

Re-designs the reference model (reference models/networks.py:13-153) for TPU:
tinycudann's fused fp16 CUDA MLPs become bf16 XLA matmuls (64-wide layers map
onto the MXU once batched over the sample pool); the hash encoder is
ops.hash_encoding; SH is closed-form VPU math.  Parameters are a plain pytree
(no framework dependency) so they shard/replicate freely under jit.

Like tinycudann's FullyFusedMLP, the MLPs are bias-free ReLU stacks.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ngp_pl_tpu.config import NGPConfig
from ngp_pl_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    hash_encode_mlp,
    init_hash_table,
    make_grid_spec,
)
from ngp_pl_tpu.ops.sh import sh_encode
from ngp_pl_tpu.ops.trunc_exp import trunc_exp

Params = Dict[str, Any]


def _mlp_init(key, sizes):
    """He-uniform init for a bias-free ReLU MLP given layer sizes."""
    ws = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        bound = (6.0 / fan_in) ** 0.5
        ws.append(jax.random.uniform(sub, (fan_in, fan_out), jnp.float32,
                                     -bound, bound))
    return ws


def _mlp_apply(ws, x, dtype, out_act=None):
    h = x.astype(dtype)
    for i, w in enumerate(ws):
        h = h @ w.astype(dtype)
        if i < len(ws) - 1:
            h = jax.nn.relu(h)
    h = h.astype(jnp.float32)
    if out_act is not None:
        h = out_act(h)
    return h


def grid_spec_for(cfg: NGPConfig) -> HashGridSpec:
    return make_grid_spec(
        n_levels=cfg.n_levels,
        n_features=cfg.n_features_per_level,
        log2_hashmap_size=cfg.log2_hashmap_size,
        base_resolution=cfg.base_resolution,
        per_level_scale=cfg.per_level_scale,
    )


def init_ngp_params(key, cfg: NGPConfig) -> Params:
    spec = grid_spec_for(cfg)
    k_table, k_sigma, k_rgb, k_tm = jax.random.split(key, 4)
    enc_dim = spec.out_dim                                  # 32
    sh_dim = cfg.sh_degree ** 2                             # 16
    params: Params = {
        "hash_table": init_hash_table(k_table, spec),
        # xyz feature MLP: 32 -> 64 -> 16 (reference networks.py:48-56)
        "sigma_mlp": _mlp_init(
            k_sigma,
            [enc_dim] + [cfg.sigma_hidden] * cfg.sigma_layers + [cfg.geo_features],
        ),
        # rgb MLP: (16 SH + 16 feat) -> 64 -> 64 -> 3 (networks.py:67-77)
        "rgb_mlp": _mlp_init(
            k_rgb,
            [sh_dim + cfg.geo_features] + [cfg.rgb_hidden] * cfg.rgb_layers + [3],
        ),
    }
    if cfg.rgb_act == "None":
        # per-channel HDR tonemappers 1 -> 64 -> 1 (networks.py:79-92)
        keys = jax.random.split(k_tm, 3)
        params["tonemapper"] = [
            _mlp_init(keys[i], [1, 64, 1]) for i in range(3)
        ]
    return params


class NGP:
    """Stateless functional wrapper bundling config + static grid spec."""

    def __init__(self, cfg: NGPConfig, need_x_grad: bool = True):
        """need_x_grad: False drops the position-gradient path from the hash
        encoder's backward (rows re-gather + trilinear derivatives, ~40% of
        the field backward) — only camera-pose refinement consumes dL/dx
        (reference train.py:117-122), so trainers pass optimize_ext here."""
        self.cfg = cfg
        self.spec = grid_spec_for(cfg)
        self.need_x_grad = need_x_grad
        self.dtype = jnp.bfloat16 if cfg.mlp_dtype == "bfloat16" else jnp.float32
        # fused Pallas field tail: reference geometry, no direction grads
        # (pose refinement needs dL/d_dir -> XLA tail); interpret-mode
        # Pallas on CPU is far slower than the XLA tail, so TPU only.
        # NGP_DISABLE_FUSED_TAIL=1 forces the XLA tail (A/B debugging).
        import os

        from ngp_pl_tpu.ops.field_pallas import field_tail_supported

        self.fused_tail = (field_tail_supported(cfg) and not need_x_grad
                           and jax.default_backend() != "cpu"
                           and not os.environ.get("NGP_DISABLE_FUSED_TAIL"))

    def init(self, key) -> Params:
        return init_ngp_params(key, self.cfg)

    # --- field queries -------------------------------------------------
    def density(self, params: Params, x: jnp.ndarray, return_feat: bool = False):
        """x: (N, 3) world positions in [-scale, scale]^3 -> sigma (N,)
        (reference networks.py:94-107).

        The hash encoding and the first sigma-MLP layer run as one fused
        level-major gather->MXU op (ops/hash_encoding.py:hash_encode_mlp);
        the remaining layers are plain matmuls."""
        cfg = self.cfg
        xn = (x + cfg.scale) / (2.0 * cfg.scale)            # -> [0, 1]
        h1 = hash_encode_mlp(xn, params["hash_table"],
                             params["sigma_mlp"][0], self.spec,
                             need_x_grad=self.need_x_grad)
        h = _mlp_apply(params["sigma_mlp"][1:], jax.nn.relu(h1), self.dtype)
        sigma = trunc_exp(h[:, 0])
        if return_feat:
            return sigma, h
        return sigma

    def forward(
        self,
        params: Params,
        x: jnp.ndarray,
        d: jnp.ndarray,
        exposure: Optional[jnp.ndarray] = None,
        output_radiance: bool = False,
    ):
        """(sigma (N,), rgb (N, 3)) from positions + view dirs
        (reference networks.py:132-153).

        With the reference geometry on TPU the post-encode stack (sigma
        layer 2 + TruncExp + rgb MLP + sigmoid) runs as the fused Pallas
        field tail — also on this flat per-sample path (the CSR train pool
        and the test renderers), where SH is computed per sample."""
        cfg = self.cfg
        if (self.fused_tail and exposure is None
                and cfg.rgb_act == "Sigmoid"):
            from ngp_pl_tpu.ops.field_pallas import _pick_bn, field_tail

            bn = _pick_bn(x.shape[0])
            if bn:
                xn = (x + cfg.scale) / (2.0 * cfg.scale)
                h1 = hash_encode_mlp(xn, params["hash_table"],
                                     params["sigma_mlp"][0], self.spec,
                                     need_x_grad=self.need_x_grad)
                dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
                sh_t = sh_encode((dn + 1.0) * 0.5, cfg.sh_degree).T
                wr3p = jnp.pad(params["rgb_mlp"][2], ((0, 0), (0, 5)))
                out_t = field_tail(bn, h1, sh_t, params["sigma_mlp"][1],
                                   params["rgb_mlp"][0],
                                   params["rgb_mlp"][1], wr3p)
                return out_t[0], out_t[1:4].T
        sigma, h = self.density(params, x, return_feat=True)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sh = sh_encode((d + 1.0) * 0.5, cfg.sh_degree)
        feats = jnp.concatenate([sh, h], axis=-1)
        if cfg.rgb_act == "Sigmoid":
            rgb = _mlp_apply(params["rgb_mlp"], feats, self.dtype,
                             out_act=jax.nn.sigmoid)
        else:  # HDR mode: rgb_mlp emits log-radiance (networks.py:109-130)
            log_rad = _mlp_apply(params["rgb_mlp"], feats, self.dtype)
            if output_radiance:
                rgb = trunc_exp(log_rad)
            else:
                log_exp = jnp.log(exposure) if exposure is not None else 0.0
                chans = []
                for i in range(3):
                    inp = log_rad[:, i:i + 1] + log_exp
                    chans.append(
                        _mlp_apply(params["tonemapper"][i], inp, self.dtype,
                                   out_act=jax.nn.sigmoid)
                    )
                rgb = jnp.concatenate(chans, axis=-1)
        return sigma, rgb

    def forward_rays(
        self,
        params: Params,
        xyz: jnp.ndarray,          # (N, S, 3) world sample positions
        rays_d: jnp.ndarray,       # (N, 3) per-ray view directions
        exposure: Optional[jnp.ndarray] = None,   # (N, 1)
    ):
        """Strided-layout field eval: (sigma (N, S), rgb_t (3, N, S)).

        Identical math to forward(), exploiting that view direction is
        constant along a ray: normalization + SH run once per RAY (N x 16)
        instead of per sample (N*S x 16) — the reference evaluates SH per
        sample because its CSR layout loses the ray structure
        (rendering.py:142-151).  rgb is returned channel-major (3, N, S):
        see composite_train_strided for the layout rationale.

        On TPU with the reference geometry the whole post-encode stack runs
        as one fused Pallas kernel (ops/field_pallas.py); the XLA path
        remains for HDR mode, pose refinement (direction grads) and CPU.
        """
        cfg = self.cfg
        N, S = xyz.shape[0], xyz.shape[1]
        P = N * S
        d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        sh_ray = sh_encode((d + 1.0) * 0.5, cfg.sh_degree)      # (N, 16)

        if self.fused_tail and exposure is None:
            from ngp_pl_tpu.ops.field_pallas import _pick_bn, field_tail

            bn = _pick_bn(P)
            if bn:
                xn = ((xyz.reshape(P, 3) + cfg.scale)
                      / (2.0 * cfg.scale))
                h1 = hash_encode_mlp(xn, params["hash_table"],
                                     params["sigma_mlp"][0], self.spec,
                                     need_x_grad=self.need_x_grad)
                sh_t = jnp.broadcast_to(
                    sh_ray.T[:, :, None], (sh_ray.shape[-1], N, S)
                ).reshape(-1, P)
                wr3p = jnp.pad(params["rgb_mlp"][2], ((0, 0), (0, 5)))
                out_t = field_tail(bn, h1, sh_t, params["sigma_mlp"][1],
                                   params["rgb_mlp"][0], params["rgb_mlp"][1],
                                   wr3p)
                return out_t[0].reshape(N, S), out_t[1:4].reshape(3, N, S)

        sigma, h = self.density(params, xyz.reshape(P, 3), return_feat=True)
        sh = jnp.broadcast_to(sh_ray[:, None, :], (N, S, sh_ray.shape[-1])
                              ).reshape(P, -1)
        feats = jnp.concatenate([sh, h], axis=-1)
        if cfg.rgb_act == "Sigmoid":
            rgb = _mlp_apply(params["rgb_mlp"], feats, self.dtype,
                             out_act=jax.nn.sigmoid)
        else:
            log_rad = _mlp_apply(params["rgb_mlp"], feats, self.dtype)
            log_exp = (jnp.log(exposure)[:, None, :].repeat(S, 1)
                       .reshape(P, 1) if exposure is not None else 0.0)
            chans = []
            for i in range(3):
                inp = log_rad[:, i:i + 1] + log_exp
                chans.append(
                    _mlp_apply(params["tonemapper"][i], inp, self.dtype,
                               out_act=jax.nn.sigmoid))
            rgb = jnp.concatenate(chans, axis=-1)
        return (sigma.reshape(N, S),
                jnp.moveaxis(rgb.reshape(N, S, 3), -1, 0))

    def __call__(self, params, x, d, **kw):
        return self.forward(params, x, d, **kw)
