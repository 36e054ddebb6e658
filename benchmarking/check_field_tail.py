#!/usr/bin/env python
"""Validate the Mosaic-compiled field-tail kernel against the XLA tail ON
DEVICE (the unit tests run the kernel in interpret mode on CPU, which cannot
catch hardware-compilation divergence)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.field_pallas import field_tail
from ngp_pl_tpu.ops.trunc_exp import trunc_exp


def xla_tail(h1, sh, w2, wr1, wr2, wr3):
    x = jax.nn.relu(h1)
    h = (x.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)).astype(jnp.float32)
    sigma = trunc_exp(h[:, 0])
    feats = jnp.concatenate([sh, h], axis=-1)
    z1 = (feats.astype(jnp.bfloat16) @ wr1.astype(jnp.bfloat16)
          ).astype(jnp.float32)
    z2 = (jax.nn.relu(z1).astype(jnp.bfloat16)
          @ wr2.astype(jnp.bfloat16)).astype(jnp.float32)
    z3 = (jax.nn.relu(z2).astype(jnp.bfloat16)
          @ wr3.astype(jnp.bfloat16)).astype(jnp.float32)
    return sigma, jax.nn.sigmoid(z3)


def main():
    P = 8192
    rng = np.random.default_rng(0)
    h1 = jnp.asarray(rng.normal(0, 1, (P, 64)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (P, 16)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.2, (64, 16)), jnp.float32)
    wr1 = jnp.asarray(rng.normal(0, 0.2, (32, 64)), jnp.float32)
    wr2 = jnp.asarray(rng.normal(0, 0.2, (64, 64)), jnp.float32)
    wr3 = jnp.asarray(rng.normal(0, 0.2, (64, 3)), jnp.float32)
    wr3p = jnp.pad(wr3, ((0, 0), (0, 5)))

    out = jax.jit(lambda *a: field_tail(1024, *a))(
        h1, sh.T, w2, wr1, wr2, wr3p)
    sig_x, rgb_x = jax.jit(xla_tail)(h1, sh, w2, wr1, wr2, wr3)
    e_sig = np.max(np.abs(np.asarray(out[0]) - np.asarray(sig_x))
                   / (np.abs(np.asarray(sig_x)) + 1e-3))
    e_rgb = np.max(np.abs(np.asarray(out[1:4].T) - np.asarray(rgb_x)))
    print(f"fwd: sigma rel err {e_sig:.2e}  rgb abs err {e_rgb:.2e}")

    g = jnp.asarray(rng.normal(0, 1, (P, 4)), jnp.float32)

    def loss_pl(h1, w2, wr1, wr2, wr3p):
        o = field_tail(1024, h1, sh.T, w2, wr1, wr2, wr3p)
        return jnp.sum(o[0] * g[:, 0] * 1e-2) + jnp.sum(o[1:4].T * g[:, 1:])

    def loss_x(h1, w2, wr1, wr2, wr3):
        s, r = xla_tail(h1, sh, w2, wr1, wr2, wr3)
        return jnp.sum(s * g[:, 0] * 1e-2) + jnp.sum(r * g[:, 1:])

    gp = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2, 3)))(h1, w2, wr1, wr2,
                                                          wr3p)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))(h1, w2, wr1, wr2,
                                                         wr3)
    names = ("d_h1", "d_w2", "d_wr1", "d_wr2")
    ok = True
    for n, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        err = np.abs(a - b).max() / denom
        print(f"bwd {n}: rel err {err:.2e}")
        ok &= err < 5e-2
    print("OK" if ok and e_sig < 5e-2 and e_rgb < 5e-3 else "MISMATCH")


if __name__ == "__main__":
    main()
