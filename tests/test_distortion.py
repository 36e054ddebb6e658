"""Distortion loss vs the O(N^2) definition + gradient check."""
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.distortion import distortion_loss


def naive_distortion(ws, deltas, ts, counts):
    """Direct Mip-NeRF-360 double sum: sum_ij w_i w_j |t_i - t_j| +
    (1/3) sum_i w_i^2 d_i, per ray."""
    out = np.zeros(len(counts))
    s = 0
    for r, cnt in enumerate(counts):
        w = ws[s:s + cnt]
        t = ts[s:s + cnt]
        d = deltas[s:s + cnt]
        out[r] = np.sum(w[:, None] * w[None, :] * np.abs(t[:, None] - t[None, :]))
        out[r] += np.sum(w * w * d) / 3.0
        s += cnt
    return out


def test_distortion_matches_naive():
    rng = np.random.default_rng(0)
    counts = [4, 0, 11, 1]
    total = sum(counts)
    pool = 32
    ws = rng.uniform(0, 0.3, total).astype(np.float32)
    deltas = rng.uniform(0.001, 0.02, total).astype(np.float32)
    # ts must be sorted within each ray (front-to-back marching order)
    ts = np.concatenate([np.sort(rng.uniform(0.5, 2, c)) for c in counts]).astype(
        np.float32)
    ray_idx = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)

    def pad(x, fill=0.0):
        out = np.full((pool,) + x.shape[1:], fill, x.dtype)
        out[:total] = x
        return jnp.asarray(out)

    got = np.asarray(distortion_loss(
        pad(ws), pad(deltas), pad(ts), pad(ray_idx, len(counts)),
        jnp.arange(pool) < total, jnp.asarray(offsets), len(counts)))
    expected = naive_distortion(ws, deltas, ts, counts)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_distortion_gradient():
    rng = np.random.default_rng(1)
    counts = [6]
    total = 6
    ws = jnp.asarray(rng.uniform(0.01, 0.3, total), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.001, 0.02, total), jnp.float32)
    ts = jnp.asarray(np.sort(rng.uniform(0.5, 2, total)), jnp.float32)
    ridx = jnp.zeros(total, jnp.int32)
    valid = jnp.ones(total, bool)
    off = jnp.zeros(1, jnp.int32)

    def loss(w):
        return distortion_loss(w, deltas, ts, ridx, valid, off, 1).sum()

    g = jax.grad(loss)(ws)
    eps = 1e-3
    for i in range(total):
        fd = (loss(ws.at[i].add(eps)) - loss(ws.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-2, atol=1e-5)
