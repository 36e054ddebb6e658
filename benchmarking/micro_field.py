#!/usr/bin/env python
"""Micro: cost of the small-MLP stack (post-encode) fwd vs fwd+bwd at pool
shapes, to locate the ~22ms gap between field and encode backward timings."""
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

from ngp_pl_tpu.config import NGPConfig
from ngp_pl_tpu.models.ngp import NGP, _mlp_apply
from ngp_pl_tpu.ops.sh import sh_encode
from ngp_pl_tpu.ops.trunc_exp import trunc_exp


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
    print(f"{name:44s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    N = 262144
    cfg = NGPConfig(scale=0.5)
    ngp = NGP(cfg, need_x_grad=False)
    params = ngp.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    h1 = jax.random.normal(key, (N, 64), jnp.float32)
    d = jax.random.normal(key, (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def stack(p, h1):
        h = _mlp_apply(p["sigma_mlp"][1:], jax.nn.relu(h1), ngp.dtype)
        sigma = trunc_exp(h[:, 0])
        sh = sh_encode((d + 1.0) * 0.5, cfg.sh_degree)
        feats = jnp.concatenate([sh, h], axis=-1)
        rgb = _mlp_apply(p["rgb_mlp"], feats, ngp.dtype,
                         out_act=jax.nn.sigmoid)
        return sigma, rgb

    @jax.jit
    def fwd(p, h1):
        s, r = stack(p, h1)
        return s.sum() + r.sum()

    @jax.jit
    def grad_p(p, h1):
        g = jax.grad(lambda p: fwd(p, h1))(p)
        return g["rgb_mlp"][0].sum()

    @jax.jit
    def grad_ph(p, h1):
        gp, gh = jax.grad(lambda p, h: fwd(p, h), argnums=(0, 1))(p, h1)
        return gp["rgb_mlp"][0].sum() + gh.sum()

    @jax.jit
    def sh_only(d):
        return sh_encode((d + 1.0) * 0.5, cfg.sh_degree).sum()

    timeit("mlp-stack fwd", fwd, params, h1)
    timeit("mlp-stack fwd+bwd (params only)", grad_p, params, h1)
    timeit("mlp-stack fwd+bwd (params + dh1)", grad_ph, params, h1)
    timeit("sh fwd", sh_only, d)

    # composite-style consumer: does a (N,) + (N,3) output pair force bad
    # layouts? compare summed vs materialized outputs
    @jax.jit
    def fwd_mat(p, h1):
        s, r = stack(p, h1)
        return s, r
    timeit("mlp-stack fwd (materialize outs)", fwd_mat, params, h1)



def bisect():
    """Bisect the field fwd+bwd gap: encode -> density -> full forward."""
    N = 262144
    cfg = NGPConfig(scale=0.5)
    ngp = NGP(cfg, need_x_grad=False)
    params = ngp.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (N, 3), jnp.float32, -0.5, 0.5)
    d = jax.random.normal(key, (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from ngp_pl_tpu.ops.hash_encoding import hash_encode_mlp
    xn = (xyz + cfg.scale) / (2 * cfg.scale)

    @jax.jit
    def enc_grad(p):
        def f(p):
            return hash_encode_mlp(xn, p["hash_table"], p["sigma_mlp"][0],
                                   ngp.spec, need_x_grad=False).sum()
        gt = jax.grad(f)(p)["hash_table"]
        return jnp.vdot(gt, gt)

    @jax.jit
    def enc_grad_real_g(p):
        # non-constant cotangent: d_h1 = cos(h1) instead of ones
        def f(p):
            h1 = hash_encode_mlp(xn, p["hash_table"], p["sigma_mlp"][0],
                                 ngp.spec, need_x_grad=False)
            return jnp.sin(h1).sum()
        gt = jax.grad(f)(p)["hash_table"]
        return jnp.vdot(gt, gt)

    @jax.jit
    def dens_grad(p):
        def f(p):
            return ngp.density(p, xyz).sum()
        gt = jax.grad(f)(p)["hash_table"]
        return jnp.vdot(gt, gt)

    @jax.jit
    def fwd_grad(p):
        def f(p):
            s, r = ngp.forward(p, xyz, d)
            return s.sum() + r.sum()
        gt = jax.grad(f)(p)["hash_table"]
        return jnp.vdot(gt, gt)

    timeit("bisect: encode fwd+bwd (g=ones)", enc_grad, params)
    timeit("bisect: encode fwd+bwd (g=cos h1)", enc_grad_real_g, params)
    timeit("bisect: density fwd+bwd", dens_grad, params)
    timeit("bisect: forward fwd+bwd", fwd_grad, params)


if __name__ == "__main__":
    main()
    bisect()
