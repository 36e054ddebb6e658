"""Correctness of the accumulating-scatter kernels vs XLA scatter-add."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu


@pytest.mark.parametrize("R,P", [(64, 500), (128, 2048)])
def test_scatter_accum_matches_xla(R, P):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(P, 128)).astype(np.float32)
    idx = rng.integers(0, R, P).astype(np.int32)
    ref = jnp.zeros((R, 128), jnp.float32).at[idx].add(d)

    from ngp_pl_tpu.ops.scatter_accum import scatter_accum

    with pltpu.force_tpu_interpret_mode():
        got = scatter_accum(jnp.asarray(d), jnp.asarray(idx), n_rows=R,
                            block=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("exact", [True, False])
def test_scatter_onehot_matches_xla(exact):
    R, P = 64, 1000
    rng = np.random.default_rng(1)
    d = rng.normal(size=(P, 128)).astype(np.float32)
    idx = rng.integers(0, R, P).astype(np.int32)
    ref = jnp.zeros((R, 128), jnp.float32).at[idx].add(d)

    from ngp_pl_tpu.ops.scatter_accum import scatter_onehot

    with pltpu.force_tpu_interpret_mode():
        got = scatter_onehot(jnp.asarray(d), jnp.asarray(idx), n_rows=R,
                             block=256, exact=exact)
    tol = 1e-5 if exact else 0.05
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=tol, atol=tol)
