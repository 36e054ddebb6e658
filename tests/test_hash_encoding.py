"""Brick-layout hash-grid encoder: layout, interpolation, gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.hash_encoding import (
    BRICK_PTS,
    hash_encode,
    hash_encode_pointwise,
    init_hash_table,
    make_grid_spec,
)


def small_spec():
    return make_grid_spec(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)


def test_spec_layout():
    spec = small_spec()
    assert spec.resolutions == (4, 8, 16, 32)
    assert spec.brick_grids == (2, 4, 8, 16)
    # S = 2^(10-5) = 32; dense while B^3 <= 2*S = 64: B=2 (8), B=4 (64) dense,
    # B=8 (512) and B=16 hashed at 32 slots
    assert spec.sizes == (8, 64, 32, 32)
    assert spec.offsets == (0, 8, 72, 104)
    assert spec.out_dim == 8
    assert spec.row_width == 64


def test_constant_table_interpolates_to_constant():
    spec = small_spec()
    used = BRICK_PTS ** 3 * spec.n_features
    lane = jnp.arange(spec.row_width)
    table = jnp.where(lane[None, :] < used, 0.7,
                      0.0) * jnp.ones((spec.total_rows, 1))
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    out = np.asarray(hash_encode(x, table, spec))
    np.testing.assert_allclose(out, 0.7, rtol=1e-5)


def test_matches_pointwise_reference():
    """The wide-row path must agree with the explicit 8-corner gather."""
    spec = small_spec()
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (spec.total_rows, spec.row_width))
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3))
    a = np.asarray(hash_encode(x, table, spec))
    b = np.asarray(hash_encode_pointwise(x, table, spec))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dense_level_manual_trilinear():
    """Level 0 (R=4, dense 2x2x2-brick grid): manual trilinear check."""
    spec = make_grid_spec(n_levels=1, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    rng = np.random.default_rng(3)
    table = rng.normal(size=(spec.total_rows, 64)).astype(np.float32)

    x = rng.uniform(0.05, 0.95, size=(32, 3)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table), spec))

    B = 2
    pos = x * 4.0
    cell = np.clip(np.floor(pos).astype(int), 0, 3)
    frac = pos - np.floor(pos)
    expected = np.zeros((32, 2))
    for c in range(8):
        off = np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1])
        brick = cell >> 1
        p = (cell & 1) + off
        slot = (brick[:, 0] * B + brick[:, 1]) * B + brick[:, 2]
        p_idx = (p[:, 0] * 3 + p[:, 1]) * 3 + p[:, 2]
        w = np.prod(np.where(off > 0.5, frac, 1 - frac), axis=-1)
        for f in range(2):
            expected[:, f] += w * table[slot, p_idx * 2 + f]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_table_gradient_finite_diff():
    spec = small_spec()
    table = init_hash_table(jax.random.PRNGKey(1), spec) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))
    probe = jax.random.normal(jax.random.PRNGKey(3), (16, spec.out_dim))

    def loss(tb):
        return jnp.sum(hash_encode(x, tb, spec) * probe)

    g = jax.grad(loss)(table)
    gnp = np.asarray(g)
    nz = np.argwhere(np.abs(gnp) > 1e-6)
    assert len(nz) > 0
    # loss is linear in the table -> large eps is exact, avoids fp32 cancel
    eps = 1.0
    for i, j in nz[:5]:
        fd = (loss(table.at[i, j].add(eps))
              - loss(table.at[i, j].add(-eps))) / (2 * eps)
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
