"""Ray marcher: chain math, occupancy culling, pool compaction."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.ops.ray_march import (
    _chain_t,
    calc_dt,
    march_rays_train,
    mip_from_dt,
    mip_from_pos,
    occupancy_at,
)

SQRT3 = math.sqrt(3.0)


def seq_chain(t0, K, f, dt_min, dt_max):
    """Sequential reference of the dt-chain (raymarching.cu stepping)."""
    ts = []
    t = t0
    for _ in range(K):
        ts.append(t)
        t = t + float(np.clip(t * f, dt_min, dt_max))
    return np.asarray(ts)


def test_chain_closed_form_matches_sequential():
    max_samples, grid_size, scale = 1024, 128, 4.0
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2 * scale / grid_size
    for f in [1.0 / 256.0]:
        for t0 in [0.02, 0.3, 1.7, 30.0]:
            K = 512
            ref = seq_chain(t0, K, f, dt_min, dt_max)
            ours = np.asarray(
                _chain_t(jnp.full((1, 1), t0), jnp.arange(K, dtype=jnp.float32)[None],
                         f, dt_min, dt_max))[0]
            np.testing.assert_allclose(ours, ref, rtol=2e-3)


def test_chain_linear():
    dt_min = SQRT3 / 1024
    ours = np.asarray(
        _chain_t(jnp.full((1, 1), 0.5), jnp.arange(8, dtype=jnp.float32)[None],
                 0.0, dt_min, 1.0))[0]
    np.testing.assert_allclose(ours, 0.5 + np.arange(8) * dt_min, rtol=1e-6)


def test_mip_selection():
    xyz = jnp.asarray([[0.3, 0.1, 0.0], [0.7, 0.0, 0.0], [1.5, 0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(mip_from_pos(xyz, 8)), [0, 1, 2])
    dt = jnp.asarray([0.5 / 128, 1.5 / 128, 2.5 / 128])
    np.testing.assert_array_equal(np.asarray(mip_from_dt(dt, 128, 8)), [0, 1, 2])


def test_occupancy_lookup():
    G, C, scale = 16, 1, 0.5
    occ = np.zeros((C, G, G, G), np.uint8)
    occ[0, 8, 8, 8] = 1  # cell covering xyz just past center
    occ_grid = jnp.asarray(occ)
    # cell (8,8,8) covers normalized [8/16, 9/16) -> x in [0, 1/16*2*scale)
    xyz = jnp.asarray([[0.01, 0.01, 0.01], [-0.2, 0.0, 0.0]])
    dt = jnp.full((2,), SQRT3 / 1024)
    got = np.asarray(occupancy_at(occ_grid, xyz, dt, C, scale, G))
    assert got[0] and not got[1]


def march(occ, rays_o, rays_d, hits_t, noise=None, **kw):
    N = rays_o.shape[0]
    args = dict(cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=occ.shape[1],
                max_samples=1024, pool_size=N * 1024)
    args.update(kw)
    if noise is None:
        noise = jnp.zeros((N,))
    return march_rays_train(rays_o, rays_d, hits_t, occ, noise, **args)


def test_march_full_grid():
    """Fully occupied grid: samples = uniform dt_min steps across the box."""
    G = 16
    occ = jnp.ones((1, G, G, G), jnp.uint8)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    hits_t = jnp.asarray([[1.5, 2.5]])
    m = march(occ, rays_o, rays_d, hits_t)
    n = int(m.counts[0])
    dt_min = SQRT3 / 1024
    assert abs(n - int(1.0 / dt_min)) <= 1
    ts = np.asarray(m.ts[:n])
    np.testing.assert_allclose(np.diff(ts), dt_min, rtol=1e-4)
    assert ts[0] >= 1.5 and ts[-1] < 2.5
    assert np.all(np.asarray(m.ray_idx[:n]) == 0)


def test_march_empty_grid():
    G = 16
    occ = jnp.zeros((1, G, G, G), jnp.uint8)
    m = march(occ, jnp.asarray([[0.0, 0.0, -2.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
              jnp.asarray([[1.5, 2.5]]))
    assert int(m.total) == 0
    assert int(m.counts[0]) == 0


def test_march_miss_ray():
    G = 16
    occ = jnp.ones((1, G, G, G), jnp.uint8)
    m = march(occ, jnp.asarray([[5.0, 5.0, 5.0]]), jnp.asarray([[1.0, 0.0, 0.0]]),
              jnp.asarray([[-1.0, -1.0]]))
    assert int(m.total) == 0


def test_march_half_occupied():
    """Only z>0 half occupied: samples should all lie in z>0."""
    G = 16
    occ = np.zeros((1, G, G, G), np.uint8)
    occ[0, :, :, G // 2:] = 1
    m = march(jnp.asarray(occ), jnp.asarray([[0.0, 0.0, -2.0]]),
              jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[1.5, 2.5]]))
    n = int(m.counts[0])
    assert n > 0
    ts = np.asarray(m.ts[:n])
    z = -2.0 + ts
    assert np.all(z >= -1e-6)


def test_march_compaction_multi_ray():
    """Pool is CSR-ordered: ray 0's samples then ray 1's."""
    G = 16
    occ = jnp.ones((1, G, G, G), jnp.uint8)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, 2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    hits_t = jnp.asarray([[1.5, 2.5], [1.5, 2.5]])
    m = march(occ, rays_o, rays_d, hits_t)
    c0, c1 = int(m.counts[0]), int(m.counts[1])
    assert int(m.offsets[1]) == c0
    assert int(m.total) == c0 + c1
    rid = np.asarray(m.ray_idx)
    assert np.all(rid[:c0] == 0)
    assert np.all(rid[c0:c0 + c1] == 1)
    assert np.all(rid[c0 + c1:] == 2)  # sentinel = N_rays


def test_march_pool_overflow_clips():
    G = 16
    occ = jnp.ones((1, G, G, G), jnp.uint8)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (4, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    hits_t = jnp.tile(jnp.asarray([[1.5, 2.5]]), (4, 1))
    m = march(occ, rays_o, rays_d, hits_t, pool_size=100)
    assert int(m.total) == 100
    assert int(m.counts.sum()) == 100  # in-pool counts clipped
    assert np.all(np.asarray(m.valid) == (np.arange(100 if False else m.ts.shape[0]) < 100))


def test_march_start_noise():
    G = 16
    occ = jnp.ones((1, G, G, G), jnp.uint8)
    args = (occ, jnp.asarray([[0.0, 0.0, -2.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
            jnp.asarray([[1.5, 2.5]]))
    m0 = march(*args)
    m1 = march(*args, noise=jnp.asarray([0.5]))
    dt_min = SQRT3 / 1024
    np.testing.assert_allclose(float(m1.ts[0]) - float(m0.ts[0]), 0.5 * dt_min,
                               rtol=1e-3)


def test_skip_empty_span_exactness():
    """The occupied-span prefix skip must not change the sample pool at all
    (it removes provably-empty chain work; positions snap to the same
    dt_min lattice)."""
    G = 16
    rng = np.random.default_rng(3)
    occ = (rng.random((1, G, G, G)) < 0.05).astype(np.uint8)
    N = 32
    d = rng.normal(size=(N, 3)) * np.float32([0.3, 0.3, 0.1]) + [0, 0, 1.0]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays_o = np.tile(np.float32([[0.1, -0.05, -2.0]]), (N, 1))
    # analytic slab hit with the scale-0.5 box
    inv = 1.0 / d
    lo = (-0.5 - rays_o) * inv
    hi = (0.5 - rays_o) * inv
    t1 = np.minimum(lo, hi).max(1)
    t2 = np.maximum(lo, hi).min(1)
    ok = (t1 <= t2) & (t2 > 0)
    hits = np.where(ok[:, None], np.stack([np.maximum(t1, 0.01), t2], -1),
                    -np.ones((N, 2), np.float32)).astype(np.float32)
    noise = rng.random(N).astype(np.float32)
    base = dict(cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=G,
                max_samples=1024, pool_size=N * 64, chain_length=1024)
    m_skip = march_rays_train(jnp.asarray(rays_o), jnp.asarray(d),
                              jnp.asarray(hits), jnp.asarray(occ),
                              jnp.asarray(noise), skip_empty_span=True, **base)
    m_ref = march_rays_train(jnp.asarray(rays_o), jnp.asarray(d),
                             jnp.asarray(hits), jnp.asarray(occ),
                             jnp.asarray(noise), skip_empty_span=False, **base)
    assert int(m_skip.total) == int(m_ref.total)
    np.testing.assert_array_equal(np.asarray(m_skip.counts),
                                  np.asarray(m_ref.counts))
    tot = int(m_ref.total)
    np.testing.assert_allclose(np.asarray(m_skip.ts[:tot]),
                               np.asarray(m_ref.ts[:tot]), rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_skip.ray_idx[:tot]),
                                  np.asarray(m_ref.ray_idx[:tot]))
    # the skip's chain demand must cover every sample it produced
    dt_min = SQRT3 / 1024
    need = int(m_skip.chain_demand)
    assert need <= 1024


def test_chain_demand_reports_need():
    """chain_demand from the fine path: one past the last occupied step."""
    G = 16
    occ = np.zeros((1, G, G, G), np.uint8)
    occ[0, :, :, G // 2:] = 1  # far half occupied (z > 0)
    m = march(jnp.asarray(occ), jnp.asarray([[0.0, 0.0, -2.0]]),
              jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[1.5, 2.5]]),
              skip_empty_span=False)
    dt_min = SQRT3 / 1024
    # last occupied point is just before z=0.5 -> t ~ 2.5; chain starts at 1.5
    need = int(m.chain_demand)
    assert abs(need - int(1.0 / dt_min)) <= 2


def test_skip_empty_span_demand_shrinks():
    """With the skip, demand reflects the occupied span, not the full range.
    (Needs a realistic grid: at tiny G the 3^3 supercell dilation covers the
    whole box and the skip conservatively does nothing.)"""
    G = 64
    occ = np.zeros((1, G, G, G), np.uint8)
    occ[0, 24:40, 24:40, 24:40] = 1  # central blob, 1/4 of the box edge
    m = march(jnp.asarray(occ), jnp.asarray([[0.0, 0.0, -2.0]]),
              jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[1.5, 2.5]]),
              skip_empty_span=True)
    dt_min = SQRT3 / 1024
    full_range = int(1.0 / dt_min)
    # blob + dilation margin spans well under half the box
    assert 0 < int(m.chain_demand) < full_range * 3 // 4
    assert int(m.counts[0]) > 0


def test_segment_march_exactness():
    """The two-level segment march must produce the identical sample pool as
    the plain chain march when the interval budget covers demand: the dilated
    coarse test is conservative (can only admit extra EMPTY intervals, never
    reject one containing an occupied fine cell) and fine t values live on
    the same t0 + k*dt_min lattice."""
    from ngp_pl_tpu.ops.ray_march import march_rays_train_segments

    G = 16
    rng = np.random.default_rng(7)
    for trial in range(3):
        occ = (rng.random((1, G, G, G)) < [0.03, 0.2, 0.7][trial]
               ).astype(np.uint8)
        N = 32
        d = rng.normal(size=(N, 3)) * np.float32([0.3, 0.3, 0.1]) + [0, 0, 1.0]
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        rays_o = np.tile(np.float32([[0.1, -0.05, -2.0]]), (N, 1))
        inv = 1.0 / d
        lo = (-0.5 - rays_o) * inv
        hi = (0.5 - rays_o) * inv
        t1 = np.minimum(lo, hi).max(1)
        t2 = np.maximum(lo, hi).min(1)
        ok = (t1 <= t2) & (t2 > 0)
        hits = np.where(ok[:, None], np.stack([np.maximum(t1, 0.01), t2], -1),
                        -np.ones((N, 2), np.float32)).astype(np.float32)
        noise = rng.random(N).astype(np.float32)
        m_seg = march_rays_train_segments(
            jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
            jnp.asarray(occ), jnp.asarray(noise),
            scale=0.5, grid_size=G, max_samples=1024, pool_size=N * 64,
            chain_length=1024, n_intervals=128)
        m_ref = march_rays_train(
            jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
            jnp.asarray(occ), jnp.asarray(noise),
            cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=G,
            max_samples=1024, pool_size=N * 64, chain_length=1024,
            skip_empty_span=False)
        assert int(m_seg.total) == int(m_ref.total)
        np.testing.assert_array_equal(np.asarray(m_seg.counts),
                                      np.asarray(m_ref.counts))
        tot = int(m_ref.total)
        np.testing.assert_allclose(np.asarray(m_seg.ts[:tot]),
                                   np.asarray(m_ref.ts[:tot]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m_seg.ray_idx[:tot]),
                                      np.asarray(m_ref.ray_idx[:tot]))


def test_segment_march_truncation_and_demand():
    """With a tiny interval budget the segment march truncates back-to-front
    (keeps the EARLIEST samples) and reports demand above the budget."""
    from ngp_pl_tpu.ops.ray_march import SEGMENT_J, march_rays_train_segments

    G = 16
    occ = np.ones((1, G, G, G), np.uint8)      # fully occupied
    N = 4
    d = np.tile(np.float32([[0.0, 0.0, 1.0]]), (N, 1))
    rays_o = np.tile(np.float32([[0.05, 0.05, -2.0]]), (N, 1))
    hits = np.tile(np.float32([[1.5, 2.5]]), (N, 1))
    noise = np.zeros(N, np.float32)
    M = 16
    m = march_rays_train_segments(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
        jnp.asarray(occ), jnp.asarray(noise),
        scale=0.5, grid_size=G, max_samples=1024, pool_size=N * 256,
        chain_length=1024, n_intervals=M)
    counts = np.asarray(m.counts)
    assert (counts == M * SEGMENT_J).all()     # every interval fully occupied
    assert int(m.chain_demand) > M * SEGMENT_J
    # earliest samples kept: first sample of ray 0 is at t0 = 1.5
    tot = int(m.total)
    ts = np.asarray(m.ts[:tot])
    ridx = np.asarray(m.ray_idx[:tot])
    np.testing.assert_allclose(ts[ridx == 0][0], 1.5, atol=1e-6)
    dt_min = SQRT3 / 1024
    np.testing.assert_allclose(np.diff(ts[ridx == 0]), dt_min, atol=1e-6)


def test_dilate_lines_matches_dilate_grid():
    """Bitwise packed dilation == reduce_window dilation + packing."""
    import jax
    from ngp_pl_tpu.ops.ray_march import (dilate_grid, dilate_lines,
                                          occupancy_lines)

    k = jax.random.PRNGKey(3)
    for C, G in ((1, 64), (2, 32)):
        occ = (jax.random.uniform(k, (C, G, G, G)) < 0.05).astype(jnp.uint8)
        ref = occupancy_lines(dilate_grid(occ))
        got = dilate_lines(occupancy_lines(occ), C, G)
        assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_march_precomputed_rows_identical():
    """march_rays_train with precomputed occ_rows == recomputed-inside."""
    from ngp_pl_tpu.ops.ray_march import march_rays_train, occupancy_lines

    k = jax.random.PRNGKey(4)
    N, G = 64, 32
    occ = (jax.random.uniform(k, (1, G, G, G)) < 0.2).astype(jnp.uint8)
    rays_o = jnp.tile(jnp.asarray([[-1.0, 0.05, 0.03]]), (N, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (N, 1))
    hits = jnp.tile(jnp.asarray([[0.5, 1.5]]), (N, 1))
    noise = jnp.linspace(0, 1, N)
    kw = dict(cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=G,
              max_samples=256, pool_size=N * 16, chain_length=256)
    a = march_rays_train(rays_o, rays_d, hits, occ, noise, **kw)
    b = march_rays_train(rays_o, rays_d, hits, occ, noise,
                         occ_rows=occupancy_lines(occ), **kw)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_window_march_exactness():
    """The windowed march must produce the identical sample pool as the plain
    chain march: every fine step's occupancy bit is read exactly (from the
    8^3 window row covering its cell) and fine t values live on the same
    t0 + k*dt_min lattice."""
    from ngp_pl_tpu.ops.ray_march import (
        march_rays_train_window,
        occupancy_windows,
    )

    G = 16
    rng = np.random.default_rng(11)
    for trial in range(3):
        occ = (rng.random((1, G, G, G)) < [0.03, 0.2, 0.7][trial]
               ).astype(np.uint8)
        N = 32
        d = rng.normal(size=(N, 3)) * np.float32([0.3, 0.3, 0.1]) + [0, 0, 1.0]
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        rays_o = np.tile(np.float32([[0.1, -0.05, -2.0]]), (N, 1))
        inv = 1.0 / d
        lo = (-0.5 - rays_o) * inv
        hi = (0.5 - rays_o) * inv
        t1 = np.minimum(lo, hi).max(1)
        t2 = np.maximum(lo, hi).min(1)
        ok = (t1 <= t2) & (t2 > 0)
        hits = np.where(ok[:, None], np.stack([np.maximum(t1, 0.01), t2], -1),
                        -np.ones((N, 2), np.float32)).astype(np.float32)
        noise = rng.random(N).astype(np.float32)
        win_rows = occupancy_windows(jnp.asarray(occ))
        m_win = march_rays_train_window(
            jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
            jnp.asarray(noise), win_rows,
            scale=0.5, grid_size=G, max_samples=1024, pool_size=N * 64,
            chain_length=1024)
        m_ref = march_rays_train(
            jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
            jnp.asarray(occ), jnp.asarray(noise),
            cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=G,
            max_samples=1024, pool_size=N * 64, chain_length=1024,
            skip_empty_span=False)
        assert int(m_win.total) == int(m_ref.total)
        np.testing.assert_array_equal(np.asarray(m_win.counts),
                                      np.asarray(m_ref.counts))
        tot = int(m_ref.total)
        np.testing.assert_allclose(np.asarray(m_win.ts[:tot]),
                                   np.asarray(m_ref.ts[:tot]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m_win.ray_idx[:tot]),
                                      np.asarray(m_ref.ray_idx[:tot]))
        assert int(m_win.chain_demand) == int(m_ref.chain_demand)


def test_occupancy_windows_bits():
    """Every window bit equals the underlying cell's occupancy (or 0 outside
    the grid)."""
    from ngp_pl_tpu.ops.ray_march import (
        WIN_APRON,
        WIN_B,
        WIN_P,
        occupancy_windows,
    )

    G = 16
    rng = np.random.default_rng(3)
    occ = (rng.random((1, G, G, G)) < 0.3).astype(np.uint8)
    rows = np.asarray(occupancy_windows(jnp.asarray(occ)))
    NW = G // WIN_B
    for w_flat in rng.integers(0, NW ** 3, 16):
        wx, wy, wz = w_flat // (NW * NW), (w_flat // NW) % NW, w_flat % NW
        row = rows[w_flat]
        for b in rng.integers(0, WIN_P ** 3, 32):
            lx, ly, lz = b // (WIN_P * WIN_P), (b // WIN_P) % WIN_P, b % WIN_P
            cx = 4 * wx - WIN_APRON + lx
            cy = 4 * wy - WIN_APRON + ly
            cz = 4 * wz - WIN_APRON + lz
            expect = 0
            if 0 <= cx < G and 0 <= cy < G and 0 <= cz < G:
                expect = int(occ[0, cx, cy, cz])
            got = (row[b // 32] >> (b % 32)) & 1
            assert got == expect, (wx, wy, wz, lx, ly, lz)


def test_window_march_mc_superset():
    """Multi-cascade windowed chain (_occ_window_chain_mc): occupancy bits
    are a SUPERSET of the per-step z-line reference (conservative fallbacks
    may add samples, never drop them), with bounded extras."""
    from ngp_pl_tpu.ops.ray_march import (
        J_MC,
        SQRT3,
        _grid_coords,
        _occ_window_chain_mc,
        occupancy_at_lines,
        occupancy_lines,
        occupancy_windows,
    )

    G = 32
    cascades = 3
    scale = 2.0
    f = 1.0 / 256.0
    max_samples = 256
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / G
    rng = np.random.default_rng(7)
    occ = (rng.random((cascades, G, G, G)) < 0.3).astype(np.uint8)
    win_rows = occupancy_windows(jnp.asarray(occ))
    occ_rows = occupancy_lines(jnp.asarray(occ))
    N = 64
    K = 256
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = ((rng.random((N, 3)) - 0.5) * 0.4).astype(np.float32)
    t0 = (0.05 + rng.random(N) * 0.3).astype(np.float32)

    occ_mc, ts, dts = _occ_window_chain_mc(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(t0), K // J_MC,
        win_rows, cascades=cascades, scale=scale, grid_size=G,
        exp_step_factor=f, dt_min=dt_min, dt_max=dt_max)
    xyz = rays_o[:, None, :] + np.asarray(ts)[..., None] * d[:, None, :]
    mip, n = _grid_coords(jnp.asarray(xyz), jnp.asarray(dts),
                          cascades, scale, G)
    occ_ref = occupancy_at_lines(occ_rows, mip, n, G)
    inbox = np.all(np.abs(xyz) < scale, axis=-1)
    mc = np.asarray(occ_mc) & inbox
    ref = np.asarray(occ_ref) & inbox
    assert not np.any(ref & ~mc), "mc window chain missed occupied samples"
    extras = (mc & ~ref).sum() / max(ref.sum(), 1)
    assert extras < 0.25, f"too many conservative extras: {extras:.3f}"


def test_march_mc_window_pool_matches_reference():
    """march_rays_train with win_rows (mc window path) produces the same
    sample pool as the z-line path on a typical multi-cascade setup (pos-mip
    dominated: margins hold, zero conservative fallbacks)."""
    from ngp_pl_tpu.ops.ray_march import occupancy_windows

    G = 32
    cascades = 3
    scale = 2.0
    f = 1.0 / 256.0
    rng = np.random.default_rng(19)
    occ = (rng.random((cascades, G, G, G)) < 0.25).astype(np.uint8)
    win_rows = occupancy_windows(jnp.asarray(occ))
    N = 48
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = np.tile(np.float32([[0.05, -0.1, -3.0]]), (N, 1))
    inv = 1.0 / d
    lo = (-scale - rays_o) * inv
    hi = (scale - rays_o) * inv
    t1 = np.minimum(lo, hi).max(1)
    t2 = np.maximum(lo, hi).min(1)
    ok = (t1 <= t2) & (t2 > 0)
    hits = np.where(ok[:, None], np.stack([np.maximum(t1, 0.01), t2], -1),
                    -np.ones((N, 2), np.float32)).astype(np.float32)
    noise = rng.random(N).astype(np.float32)
    kw = dict(cascades=cascades, scale=scale, exp_step_factor=f,
              grid_size=G, max_samples=512, pool_size=N * 64,
              chain_length=1024, skip_empty_span=False)
    m_ref = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
        jnp.asarray(occ), jnp.asarray(noise), **kw)
    m_mc = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(hits),
        jnp.asarray(occ), jnp.asarray(noise), win_rows=win_rows, **kw)
    assert int(m_mc.total) == int(m_ref.total)
    np.testing.assert_array_equal(np.asarray(m_mc.counts),
                                  np.asarray(m_ref.counts))
    tot = int(m_ref.total)
    np.testing.assert_allclose(np.asarray(m_mc.ts[:tot]),
                               np.asarray(m_ref.ts[:tot]), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_mc.ray_idx[:tot]),
                                  np.asarray(m_ref.ray_idx[:tot]))
