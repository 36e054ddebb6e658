"""Truncated-gradient exponential (reference models/custom_functions.py:162-173).

Backward clamps the *input* to [-15, 15] before re-exponentiating, which
bounds the gradient magnitude without biasing the forward value.

The forward additionally clamps at +/-30 (sigma <= ~1.1e13): any occupied
sample above sigma ~1e4 already renders fully opaque, so the clamp is
semantically invisible — but WITHOUT it a density logit crossing ~88.7
overflows f32 exp to inf and one poisoned sample NaNs the whole training
state (root-caused round 4: a 30k-step run died at step 12246 with fully
finite, small parameters; the logit of one cell crept past the f32 exp
range at late-schedule learning rates).  The reference is exposed to the
same overflow in principle (TruncExp.forward is a bare exp on an fp16
network output, custom_functions.py:165) — its fp16 saturation at 65504
merely makes the blow-up rarer, not impossible.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(jnp.clip(x, -30.0, 30.0))


def _fwd(x):
    return jnp.exp(jnp.clip(x, -30.0, 30.0)), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
