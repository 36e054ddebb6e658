"""Compositing: scan form vs a sequential NumPy port of the CUDA algorithm,
and autodiff gradients vs the analytic backward."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.volume_render import composite_train, composite_test_round


def seq_composite(sigmas, rgbs, deltas, ts, counts, T_threshold):
    """Sequential reference (volumerendering.cu:6-84)."""
    n_rays = len(counts)
    opacity = np.zeros(n_rays)
    depth = np.zeros(n_rays)
    rgb = np.zeros((n_rays, 3))
    ws = np.zeros(len(sigmas))
    vr = np.zeros(n_rays, int)
    s = 0
    for r, cnt in enumerate(counts):
        T = 1.0
        for i in range(cnt):
            a = 1.0 - np.exp(-sigmas[s + i] * deltas[s + i])
            w = a * T
            rgb[r] += w * rgbs[s + i]
            depth[r] += w * ts[s + i]
            opacity[r] += w
            ws[s + i] = w
            T *= 1.0 - a
            vr[r] += 1
            if T <= T_threshold:
                break
        s += cnt
    return opacity, depth, rgb, ws, vr


def make_pool(counts, pool_size, seed=0):
    rng = np.random.default_rng(seed)
    total = sum(counts)
    sigmas = rng.uniform(0.0, 30.0, total).astype(np.float32)
    rgbs = rng.uniform(0, 1, (total, 3)).astype(np.float32)
    deltas = rng.uniform(0.001, 0.02, total).astype(np.float32)
    ts = rng.uniform(0.5, 2.0, total).astype(np.float32)
    ray_idx = np.repeat(np.arange(len(counts)), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def pad(x, fill=0):
        shape = (pool_size,) + x.shape[1:]
        out = np.full(shape, fill, x.dtype)
        out[:total] = x
        return jnp.asarray(out)

    return (
        pad(sigmas), pad(rgbs), pad(deltas), pad(ts),
        pad(ray_idx.astype(np.int32), len(counts)),
        jnp.arange(pool_size) < total,
        jnp.asarray(offsets, jnp.int32),
        (sigmas, rgbs, deltas, ts),
    )


def test_composite_matches_sequential():
    counts = [5, 0, 17, 1, 40]
    (sig, rgb_s, dl, t_s, ridx, valid, off, raw) = make_pool(counts, 128)
    out = composite_train(sig, rgb_s, dl, t_s, ridx, valid, off,
                          n_rays=len(counts), T_threshold=1e-4)
    opacity, depth, rgb, ws, vr = seq_composite(*raw, counts, 1e-4)
    np.testing.assert_allclose(np.asarray(out["opacity"]), opacity, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["ws"])[:sum(counts)], ws,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["vr_samples"]), vr)


def test_composite_early_termination():
    """A huge-density first sample should kill the rest of the ray."""
    counts = [10]
    (sig, rgb_s, dl, t_s, ridx, valid, off, raw) = make_pool(counts, 16)
    sig = sig.at[0].set(1e4)
    out = composite_train(sig, rgb_s, dl, t_s, ridx, valid, off, n_rays=1,
                          T_threshold=1e-4)
    ws = np.asarray(out["ws"])
    assert ws[0] > 0.99
    assert np.all(ws[1:] == 0)
    assert int(out["vr_samples"][0]) == 1


def test_composite_gradients_finite_diff():
    counts = [3, 7]
    (sig, rgb_s, dl, t_s, ridx, valid, off, raw) = make_pool(counts, 16, seed=1)
    sig = sig * 0.1  # moderate densities so T stays > threshold

    probe_rgb = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3)),
                            jnp.float32)

    def loss(s):
        out = composite_train(s, rgb_s, dl, t_s, ridx, valid, off, n_rays=2,
                              T_threshold=1e-4)
        return (jnp.sum(out["rgb"] * probe_rgb) + jnp.sum(out["opacity"])
                + 0.3 * jnp.sum(out["depth"]) + 0.1 * jnp.sum(out["ws"] ** 2))

    g = jax.grad(loss)(sig)
    total = sum(counts)
    eps = 1e-2
    for i in [0, 2, 5, 9]:
        fd = (loss(sig.at[i].add(eps)) - loss(sig.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-4)
    # invalid slots get zero gradient
    assert np.all(np.asarray(g)[total:] == 0)


def test_composite_test_round_incremental():
    """Two rounds of incremental compositing == one-shot compositing."""
    rng = np.random.default_rng(3)
    N, S = 4, 6
    sigmas = jnp.asarray(rng.uniform(0, 20, (N, 2 * S)), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (N, 2 * S, 3)), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.001, 0.02, (N, 2 * S)), jnp.float32)
    ts = jnp.asarray(np.sort(rng.uniform(0.5, 2, (N, 2 * S)), axis=1),
                     jnp.float32)
    valid = jnp.ones((N, 2 * S), bool)

    opa = jnp.zeros(N); dep = jnp.zeros(N); rgb = jnp.zeros((N, 3))
    alive = jnp.ones(N, bool)
    o1, d1, c1, a1 = composite_test_round(
        sigmas[:, :S], rgbs[:, :S], deltas[:, :S], ts[:, :S], valid[:, :S],
        opa, dep, rgb, alive, 1e-4)
    o2, d2, c2, a2 = composite_test_round(
        sigmas[:, S:], rgbs[:, S:], deltas[:, S:], ts[:, S:], valid[:, S:],
        o1, d1, c1, a1, 1e-4)

    oo, do, co, ao = composite_test_round(
        sigmas, rgbs, deltas, ts, valid, opa, dep, rgb, alive, 1e-4)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(oo), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(co), rtol=1e-3,
                               atol=1e-5)


def test_runaway_density_stays_finite():
    """Regression for the r5 root cause: finite-but-huge sigma*delta
    (density runaway at late training) used to drive the CSR compositor's
    global prefix sum to ~1e13, where f32 cancellation in the segment
    difference produced NEGATIVE optical depths -> exp(+huge) = inf ->
    NaN loss (every 30k run died at ~step 12.2k).  With the SD_CLAMP +
    clipped segment depths, outputs and gradients stay finite and opaque
    rays render opacity == 1."""
    from ngp_pl_tpu.ops.volume_render import composite_train

    n_rays, per = 64, 512
    P = n_rays * per
    rng = np.random.default_rng(0)
    # every sample ultra-opaque: sigma ~ e^24, delta ~ 1.7e-3 -> sd ~ 4.5e7
    sigmas = jnp.asarray(
        np.full(P, 2.6e10, np.float32) * (0.5 + rng.random(P)))
    rgbs = jnp.asarray(rng.random((P, 3)).astype(np.float32))
    deltas = jnp.full((P,), 1.7e-3, jnp.float32)
    ts = jnp.asarray(np.tile(np.linspace(0.1, 1.0, per), n_rays)
                     .astype(np.float32))
    ray_idx = jnp.asarray(np.repeat(np.arange(n_rays), per).astype(np.int32))
    valid = jnp.ones((P,), bool)
    offsets = jnp.asarray((np.arange(n_rays) * per).astype(np.int32))

    def loss(sigmas):
        out = composite_train(sigmas, rgbs, deltas, ts, ray_idx, valid,
                              offsets, n_rays=n_rays)
        return ((out["rgb"] - 0.5) ** 2).mean(), out

    (l, out), g = jax.value_and_grad(loss, has_aux=True)(sigmas)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(out["opacity"]), 1.0, atol=1e-5)
