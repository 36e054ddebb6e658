"""Fused Pallas field tail vs the XLA tail (interpret mode on CPU).

The tail covers sigma-layer-2 + TruncExp + rgb MLP + sigmoid
(reference networks.py:48-77 + custom_functions.py:162-173)."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.field_pallas import field_tail
from ngp_pl_tpu.ops.trunc_exp import trunc_exp


def _xla_tail(h1, sh, w2, wr1, wr2, wr3):
    x = jax.nn.relu(h1)
    h = (x.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)).astype(jnp.float32)
    sigma = trunc_exp(h[:, 0])
    feats = jnp.concatenate([sh, h], axis=-1)
    z1 = (feats.astype(jnp.bfloat16) @ wr1.astype(jnp.bfloat16)
          ).astype(jnp.float32)
    r1 = jax.nn.relu(z1)
    z2 = (r1.astype(jnp.bfloat16) @ wr2.astype(jnp.bfloat16)
          ).astype(jnp.float32)
    r2 = jax.nn.relu(z2)
    z3 = (r2.astype(jnp.bfloat16) @ wr3.astype(jnp.bfloat16)
          ).astype(jnp.float32)
    return sigma, jax.nn.sigmoid(z3)


def _setup(P=256, seed=0):
    rng = np.random.default_rng(seed)
    h1 = jnp.asarray(rng.normal(0, 1, (P, 64)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (P, 16)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.2, (64, 16)), jnp.float32)
    wr1 = jnp.asarray(rng.normal(0, 0.2, (32, 64)), jnp.float32)
    wr2 = jnp.asarray(rng.normal(0, 0.2, (64, 64)), jnp.float32)
    wr3 = jnp.asarray(rng.normal(0, 0.2, (64, 3)), jnp.float32)
    return h1, sh, w2, wr1, wr2, wr3


def test_field_tail_fwd_matches_xla():
    h1, sh, w2, wr1, wr2, wr3 = _setup()
    wr3p = jnp.pad(wr3, ((0, 0), (0, 5)))
    out_t = jax.jit(lambda *a: field_tail(128, *a))(
        h1, sh.T, w2, wr1, wr2, wr3p)
    sigma, rgb = _xla_tail(h1, sh, w2, wr1, wr2, wr3)
    np.testing.assert_allclose(np.asarray(out_t[0]), np.asarray(sigma),
                               rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t[1:4].T), np.asarray(rgb),
                               rtol=2e-2, atol=2e-3)


def test_field_tail_grads_match_xla():
    h1, sh, w2, wr1, wr2, wr3 = _setup(seed=3)
    wr3p = jnp.pad(wr3, ((0, 0), (0, 5)))

    def loss_pl(h1, w2, wr1, wr2, wr3p):
        out = field_tail(128, h1, sh.T, w2, wr1, wr2, wr3p)
        return (out[0].sum() * 1e-2 + out[1:4].sum())

    def loss_xla(h1, w2, wr1, wr2, wr3):
        sigma, rgb = _xla_tail(h1, sh, w2, wr1, wr2, wr3)
        return sigma.sum() * 1e-2 + rgb.sum()

    g_pl = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4)))(
        h1, w2, wr1, wr2, wr3p)
    g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(
        h1, w2, wr1, wr2, wr3)
    names = ["d_h1", "d_w2", "d_wr1", "d_wr2", "d_wr3"]
    for n, a, b in zip(names, g_pl, g_x):
        a = np.asarray(a)
        if n == "d_wr3":
            a = a[:, :3]
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2,
                                   err_msg=n)


def test_forward_rays_fused_gate_off_on_cpu():
    """On CPU the fused tail must be disabled (interpret-mode too slow)."""
    from ngp_pl_tpu.config import NGPConfig
    from ngp_pl_tpu.models.ngp import NGP

    ngp = NGP(NGPConfig(scale=0.5))
    assert not ngp.fused_tail
