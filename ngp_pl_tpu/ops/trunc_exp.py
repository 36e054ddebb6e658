"""Truncated-gradient exponential (reference models/custom_functions.py:162-173).

Forward is a plain exp; backward clamps the *input* to [-15, 15] before
re-exponentiating, which bounds the gradient magnitude without biasing the
forward value.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _fwd(x):
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
