"""Hash-grid encoder: interpolation correctness + gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.hash_encoding import (
    hash_encode,
    init_hash_table,
    make_grid_spec,
)


def small_spec():
    return make_grid_spec(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)


def test_spec_layout():
    spec = small_spec()
    assert spec.resolutions == (4, 8, 16, 32)
    # dense while (R+1)^3 <= 1024: R=4 -> 125, R=8 -> 729, R=16 -> 4913 > 1024
    assert spec.sizes == (125, 729, 1024, 1024)
    assert spec.offsets == (0, 125, 854, 1878)
    assert spec.out_dim == 8


def test_constant_table_interpolates_to_constant():
    """With every table entry equal, trilinear interp returns that constant."""
    spec = small_spec()
    table = jnp.full((spec.total_entries, 2), 0.7, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    out = np.asarray(hash_encode(x, table, spec))
    np.testing.assert_allclose(out, 0.7, rtol=1e-5)


def test_dense_level_matches_manual_trilinear():
    """Level 0 is dense: compare against a manual trilinear interpolation."""
    spec = make_grid_spec(n_levels=1, n_features=1, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    rng = np.random.default_rng(3)
    table = rng.normal(size=(spec.total_entries, 1)).astype(np.float32)
    # dense layout: idx = x + 5*(y + 5*z)
    dense = table[:125, 0]

    x = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table), spec))[:, 0]

    pos = x * 4.0
    c0 = np.floor(pos).astype(int)
    f = pos - c0
    expected = np.zeros(32)
    for corner in range(8):
        off = np.array([(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1])
        cc = np.clip(c0 + off, 0, 4)
        idx = cc[:, 0] + 5 * (cc[:, 1] + 5 * cc[:, 2])
        w = np.prod(np.where(off > 0, f, 1 - f), axis=-1)
        expected += w * dense[idx]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_table_gradient_finite_diff():
    spec = small_spec()
    key = jax.random.PRNGKey(1)
    table = init_hash_table(key, spec) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))
    probe = jax.random.normal(jax.random.PRNGKey(3), (16, spec.out_dim))

    def loss(tb):
        return jnp.sum(hash_encode(x, tb, spec) * probe)

    g = jax.grad(loss)(table)
    # check a few entries touched by the gradient
    gnp = np.asarray(g)
    nz = np.argwhere(np.abs(gnp) > 1e-6)
    assert len(nz) > 0
    # loss is exactly linear in the table, so a large eps is exact and
    # avoids fp32 cancellation
    eps = 1.0
    for i, j in nz[:5]:
        tp = table.at[i, j].add(eps)
        tm = table.at[i, j].add(-eps)
        fd = (loss(tp) - loss(tm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=1e-2,
                                   atol=1e-4)


def test_position_gradient_flows():
    spec = small_spec()
    table = init_hash_table(jax.random.PRNGKey(4), spec)

    def loss(x):
        return jnp.sum(hash_encode(x, table, spec) ** 2)

    g = jax.grad(loss)(jax.random.uniform(jax.random.PRNGKey(5), (8, 3),
                                          minval=0.1, maxval=0.9))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
