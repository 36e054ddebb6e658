"""Strided-layout train path: march / composite / distortion vs the CSR pool
implementations (which are themselves validated against sequential NumPy
ports of the reference kernels, raymarching.cu:166-332 /
volumerendering.cu:6-202 / losses.cu:9-175)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_pl_tpu.ops.ray_march import (
    _select_first_bits,
    march_rays_train,
    march_rays_train_strided,
    occupancy_lines,
    occupancy_windows,
)
from ngp_pl_tpu.ops.volume_render import composite_train, composite_train_strided
from ngp_pl_tpu.ops.distortion import distortion_loss, distortion_loss_strided


def _scene(grid_size=32, n=24, seed=0, frac=0.1):
    rng = np.random.default_rng(seed)
    occ = (rng.random((1, grid_size, grid_size, grid_size)) < frac).astype(
        np.uint8)
    rays_o = np.full((n, 3), -1.2, np.float32)
    rays_o += rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    target = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    rays_d = target - rays_o
    rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
    noise = rng.random(n).astype(np.float32)
    return occ, rays_o, rays_d, noise


def test_select_first_bits_matches_numpy():
    rng = np.random.default_rng(3)
    N, K, S = 17, 96, 8
    occ = rng.random((N, K)) < 0.2
    k_idx, counts, total = jax.jit(
        lambda o: _select_first_bits(o, S))(jnp.asarray(occ))
    k_idx, counts, total = map(np.asarray, (k_idx, counts, total))
    for i in range(N):
        want = np.nonzero(occ[i])[0]
        assert total[i] == len(want)
        c = min(len(want), S)
        assert counts[i] == c
        np.testing.assert_array_equal(k_idx[i, :c], want[:c])


@pytest.mark.parametrize("use_window", [False, True])
def test_strided_march_matches_csr_pool(use_window):
    from ngp_pl_tpu.models.rendering import scene_hits

    G = 128 if use_window else 32
    occ, rays_o, rays_d, noise = _scene(grid_size=G, n=16, frac=0.05)
    hits = scene_hits(jnp.asarray(rays_o), jnp.asarray(rays_d), 0.5)
    S = 16
    kw = dict(scale=0.5, grid_size=G, max_samples=1024)
    occ_j = jnp.asarray(occ)
    win = occupancy_windows(occ_j) if use_window else None
    m_s = march_rays_train_strided(
        jnp.asarray(rays_o), jnp.asarray(rays_d), hits, jnp.asarray(noise),
        occ_j, cascades=1, exp_step_factor=0.0, n_samples=S,
        chain_length=1024, win_rows=win, **kw)
    m_c = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(rays_d), hits, occ_j,
        jnp.asarray(noise), cascades=1, exp_step_factor=0.0,
        pool_size=16 * 1024, chain_length=1024, skip_empty_span=False, **kw)
    counts = np.asarray(m_c.counts)
    offs = np.asarray(m_c.offsets)
    ts_pool = np.asarray(m_c.ts)
    ts_str = np.asarray(m_s.ts)
    val_str = np.asarray(m_s.valid)
    for r in range(len(counts)):
        c = min(counts[r], S)
        assert val_str[r, :c].all() and not val_str[r, c:].any()
        np.testing.assert_allclose(
            ts_str[r, :c], ts_pool[offs[r]:offs[r] + c], rtol=1e-6)


def test_strided_composite_matches_csr():
    rng = np.random.default_rng(7)
    N, S = 12, 16
    counts = rng.integers(0, S + 1, N)
    counts[0] = 0
    sig = rng.random((N, S)).astype(np.float32) * 30
    rgb = rng.random((N, S, 3)).astype(np.float32)
    dt = np.full((N, S), 0.01, np.float32)
    ts = np.cumsum(dt, axis=1).astype(np.float32)
    valid = np.arange(S)[None, :] < counts[:, None]

    out_s = jax.jit(composite_train_strided)(
        jnp.asarray(sig), jnp.moveaxis(jnp.asarray(rgb), -1, 0),
        jnp.asarray(dt), jnp.asarray(ts), jnp.asarray(valid))

    # CSR layout of the same samples
    P = int(counts.sum()) + 8
    ray_idx = np.full(P, N, np.int32)
    flat = {k: np.zeros(P, np.float32) for k in ("sig", "dt", "ts")}
    rgbf = np.zeros((P, 3), np.float32)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    p = 0
    for r in range(N):
        c = counts[r]
        ray_idx[p:p + c] = r
        flat["sig"][p:p + c] = sig[r, :c]
        flat["dt"][p:p + c] = dt[r, :c]
        flat["ts"][p:p + c] = ts[r, :c]
        rgbf[p:p + c] = rgb[r, :c]
        p += c
    out_c = jax.jit(lambda *a: composite_train(*a, n_rays=N))(
        jnp.asarray(flat["sig"]), jnp.asarray(rgbf), jnp.asarray(flat["dt"]),
        jnp.asarray(flat["ts"]), jnp.asarray(ray_idx),
        jnp.asarray(np.arange(P) < counts.sum()), jnp.asarray(offs))

    for k in ("opacity", "depth", "rgb"):
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_c[k]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_s["vr_samples"]),
                                  np.asarray(out_c["vr_samples"]))


def test_strided_composite_grads_vs_fd():
    rng = np.random.default_rng(11)
    N, S = 4, 6
    sig = rng.random((N, S)).astype(np.float32) * 5
    rgb = rng.random((N, S, 3)).astype(np.float32)
    dt = np.full((N, S), 0.05, np.float32)
    ts = np.cumsum(dt, axis=1).astype(np.float32)
    valid = np.ones((N, S), bool)
    valid[1, 4:] = False

    def f(s):
        out = composite_train_strided(
            s, jnp.moveaxis(jnp.asarray(rgb), -1, 0), jnp.asarray(dt),
            jnp.asarray(ts), jnp.asarray(valid), T_threshold=0.0)
        return (out["rgb"].sum() + 0.3 * out["depth"].sum()
                + 0.1 * out["opacity"].sum())

    g = np.asarray(jax.grad(f)(jnp.asarray(sig)))
    eps = 1e-3
    for (i, j) in [(0, 0), (1, 3), (2, 5), (3, 2)]:
        sp, sm = sig.copy(), sig.copy()
        sp[i, j] += eps
        sm[i, j] -= eps
        fd = (float(f(jnp.asarray(sp))) - float(f(jnp.asarray(sm)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-4)


def test_strided_distortion_matches_csr():
    rng = np.random.default_rng(13)
    N, S = 8, 12
    counts = rng.integers(0, S + 1, N)
    ws = rng.random((N, S)).astype(np.float32) * 0.2
    dt = np.full((N, S), 0.01, np.float32)
    ts = (np.cumsum(dt, axis=1) + 0.5).astype(np.float32)
    valid = np.arange(S)[None, :] < counts[:, None]

    out_s = np.asarray(jax.jit(distortion_loss_strided)(
        jnp.asarray(ws), jnp.asarray(dt), jnp.asarray(ts), jnp.asarray(valid)))

    P = int(counts.sum()) + 4
    ray_idx = np.full(P, N, np.int32)
    flat_w = np.zeros(P, np.float32)
    flat_dt = np.zeros(P, np.float32)
    flat_ts = np.zeros(P, np.float32)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    p = 0
    for r in range(N):
        c = counts[r]
        ray_idx[p:p + c] = r
        flat_w[p:p + c] = ws[r, :c]
        flat_dt[p:p + c] = dt[r, :c]
        flat_ts[p:p + c] = ts[r, :c]
        p += c
    out_c = np.asarray(jax.jit(
        lambda *a: distortion_loss(*a, n_rays=N))(
        jnp.asarray(flat_w), jnp.asarray(flat_dt), jnp.asarray(flat_ts),
        jnp.asarray(ray_idx), jnp.asarray(np.arange(P) < counts.sum()),
        jnp.asarray(offs)))
    # summation-order differences only
    np.testing.assert_allclose(out_s, out_c, rtol=1e-3, atol=1e-6)


def test_render_rays_train_strided_end_to_end():
    """Full strided render: finite outputs, gradient flows to table & rays."""
    from ngp_pl_tpu.config import NGPConfig, RenderConfig
    from ngp_pl_tpu.models.ngp import NGP
    from ngp_pl_tpu.models.rendering import render_rays_train

    cfg = NGPConfig(scale=0.5, n_levels=4, log2_hashmap_size=12, grid_size=32)
    ngp = NGP(cfg)
    params = ngp.init(jax.random.PRNGKey(0))
    occ, rays_o, rays_d, noise = _scene(grid_size=32, n=8, frac=0.3)
    rcfg = RenderConfig(max_samples=128)

    def f(params, rays_o):
        out = render_rays_train(
            ngp, params, jnp.asarray(occ), rays_o, jnp.asarray(rays_d),
            jnp.asarray(noise), jnp.ones((3,)), rcfg=rcfg, n_samples=16,
            chain_length=128)
        return out["rgb"].sum(), out

    (val, out), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, jnp.asarray(rays_o))
    assert np.isfinite(float(val))
    assert out["rgb"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    gt = np.asarray(grads[0]["hash_table"])
    assert np.isfinite(gt).all() and np.abs(gt).max() > 0
    go = np.asarray(grads[1])
    assert np.isfinite(go).all()
