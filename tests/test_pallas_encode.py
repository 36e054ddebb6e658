"""Pallas fused encode kernels vs the XLA reference path (interpret mode,
so the kernel logic is exercised on CPU without TPU hardware)."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.hash_encoding import (
    _encode_mlp_cv,
    _meta_T,
    _slots_local_frac_lm,
    expand_w1,
    init_hash_table,
    make_grid_spec,
)
from ngp_pl_tpu.ops.hash_encoding_pallas import (
    encode_mlp_bwd_pallas,
    encode_mlp_fwd_pallas,
    unpack_feats,
)


def _setup(N=256):
    spec = make_grid_spec(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e4
    w1 = jax.random.normal(jax.random.PRNGKey(1), (spec.out_dim, 16)) * 0.3
    w1big = expand_w1(w1, spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, 3))
    return spec, table, w1big, x


def test_fwd_kernel_matches_xla():
    spec, table, w1big, x = _setup()
    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    dup = 2 if W == 64 else 1
    slot, local, frac = _slots_local_frac_lm(jnp.clip(x, 0, 1), spec)
    meta = _meta_T(local, frac, dup)
    rows = table[slot.reshape(-1)].reshape(L, N, W)
    h1, ft2 = encode_mlp_fwd_pallas(rows, meta, w1big, F=spec.n_features,
                                    bn=128, interpret=True)
    feats = unpack_feats(ft2, L, spec.n_features, dup)
    h_ref = np.asarray(_encode_mlp_cv(spec, False, x, table, w1big))
    scale = np.abs(h_ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(h1) / scale, h_ref / scale,
                               atol=2e-2)
    # feats residual reproduces the plain hash encoding (per level)
    from ngp_pl_tpu.ops.hash_encoding import hash_encode

    F = spec.n_features
    f_ref = np.asarray(hash_encode(x, table, spec)).reshape(N, L, F)
    f_ref = np.moveaxis(f_ref, 1, 0)                   # (L, N, F)
    fscale = np.abs(f_ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(feats) / fscale, f_ref / fscale,
                               atol=2e-2)


def test_bwd_kernel_matches_autodiff():
    spec, table, w1big, x = _setup()
    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    dup = 2 if W == 64 else 1
    slot, local, frac = _slots_local_frac_lm(jnp.clip(x, 0, 1), spec)
    meta = _meta_T(local, frac, dup)
    g = jax.random.normal(jax.random.PRNGKey(3), (N, w1big.shape[-1]))

    d_rows = encode_mlp_bwd_pallas(meta, w1big, g, F=spec.n_features,
                                   bn=128, interpret=True)

    # reference: d_rows = (g @ w1big[l]^T) * wrow, in bf16 contraction
    from ngp_pl_tpu.ops.hash_encoding import _wrow_lm

    d_wr = jax.lax.dot_general(
        g.astype(jnp.bfloat16),
        jnp.moveaxis(w1big, 0, 0).astype(jnp.bfloat16),
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)          # (N, L, W)
    d_ref = jnp.moveaxis(d_wr, 1, 0) * _wrow_lm(local, frac, spec)
    scale = np.abs(np.asarray(d_ref)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(d_rows) / scale,
                               np.asarray(d_ref) / scale, atol=2e-2)


def test_fwd_kernel_matches_xla_f4():
    """F=4 geometry (128-wide tile rows, unpaired kernel path)."""
    spec = make_grid_spec(n_levels=4, n_features=4, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e4
    w1 = jax.random.normal(jax.random.PRNGKey(1), (spec.out_dim, 16)) * 0.3
    w1big = expand_w1(w1, spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (256,) + (3,))
    N = x.shape[0]
    L, W = spec.n_levels, spec.row_width
    assert W == 128
    dup = 1
    slot, local, frac = _slots_local_frac_lm(jnp.clip(x, 0, 1), spec)
    meta = _meta_T(local, frac, dup)
    rows = table[slot.reshape(-1)].reshape(L, N, W)
    h1, ft2 = encode_mlp_fwd_pallas(rows, meta, w1big, F=4, bn=128,
                                    interpret=True)
    h_ref = np.asarray(_encode_mlp_cv(spec, False, x, table, w1big))
    scale = np.abs(h_ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(h1) / scale, h_ref / scale,
                               atol=2e-2)

    from ngp_pl_tpu.ops.hash_encoding import hash_encode

    feats = unpack_feats(ft2, L, 4, dup)
    f_ref = np.asarray(hash_encode(x, table, spec)).reshape(N, L, 4)
    f_ref = np.moveaxis(f_ref, 1, 0)
    fscale = np.abs(f_ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(feats) / fscale, f_ref / fscale,
                               atol=2e-2)

    # bwd
    g = jax.random.normal(jax.random.PRNGKey(3), (N, 16))
    d_rows = encode_mlp_bwd_pallas(meta, w1big, g, F=4, bn=128,
                                   interpret=True)
    from ngp_pl_tpu.ops.hash_encoding import _wrow_lm

    d_wr = jax.lax.dot_general(
        g.astype(jnp.bfloat16), w1big.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_ref = jnp.moveaxis(d_wr, 1, 0) * _wrow_lm(local, frac, spec)
    scale = np.abs(np.asarray(d_ref)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(d_rows) / scale,
                               np.asarray(d_ref) / scale, atol=2e-2)


def test_encode_mlp_grad_f4_matches_xla_path():
    """End-to-end custom-vjp pallas path vs XLA path gradients for F=4."""
    from ngp_pl_tpu.ops.hash_encoding import _encode_mlp_pl_cv

    spec = make_grid_spec(n_levels=4, n_features=4, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e4
    w1 = jax.random.normal(jax.random.PRNGKey(1), (spec.out_dim, 16)) * 0.3
    x = jax.random.uniform(jax.random.PRNGKey(2), (256, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (256, 16))

    def loss_pl(t, w):
        return (_encode_mlp_pl_cv(spec, 128, x, t, w) * g).sum()

    def loss_ref(t, w):
        return (_encode_mlp_cv(spec, False, x, t, expand_w1(w, spec))
                * g).sum()

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        gt_p, gw_p = jax.grad(loss_pl, argnums=(0, 1))(table, w1)
    gt_r, _ = jax.grad(loss_ref, argnums=(0, 1))(table, w1)
    s = np.abs(np.asarray(gt_r)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(gt_p) / s, np.asarray(gt_r) / s,
                               atol=2e-2)
