#!/usr/bin/env python
"""Per-component timing of the ROUNDS-layout train step at bench shapes.

The bench steady state runs `render_rays_train_rounds` (4 unrolled rounds,
slots N, N/2, N/4, N/8, S samples per ray per round).  This profiler warms a
system past the layout flip, then times:
  - the full step in rounds / csr / strided layouts at the converged state
  - the rounds renderer fwd and fwd+bwd in isolation
  - per-round march + field at each (slots, S) shape
  - encoder internals at the total-slot shape: packed-f16 gather, Pallas
    fwd/bwd, per-level table scatters
Prints a table to stderr; run on the real chip.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def timeit(name, fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    B = int(os.environ.get("PROF_BATCH", 8192))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=B,
                       num_epochs=30, exp_name="prof_rounds",
                       no_save_test=True)
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    warm = int(os.environ.get("PROF_WARM", 512))
    nb = tcfg.grid_update_interval
    print("warming to rounds steady state...", file=sys.stderr, flush=True)
    for i in range(warm // nb):
        m = system.step_block()
    float(np.asarray(m["loss"]))
    S = system._pool_mult
    chain = system._rounds_chain
    print(f"steady: layout {system.layout} S {S} rounds_chain {chain} "
          f"rm_s {float(np.asarray(m['rm_samples']))/B:.1f} "
          f"vr_s {float(np.asarray(m['vr_samples']))/B:.1f}",
          file=sys.stderr, flush=True)
    system.freeze_buckets = True

    full = not os.environ.get("PROF_ENC_ONLY")
    # full blocks in each layout (ms/step = block/nb)
    for layout in (("rounds", "csr", "strided") if full else ("strided",)):
        system.layout = layout
        dt = timeit(f"step_block [{layout}] /{nb}",
                    lambda: system.step_block()["loss"], n=6)
        print(f"  -> {dt / nb:8.2f} ms/step", file=sys.stderr, flush=True)
    system.layout = "rounds"

    ngp, cfg, rcfg = system.ngp, system.cfg, system.rcfg
    params = system.state.params
    occ = system.grid_state.occ_grid
    occ_rows = system.grid_state.occ_rows
    win_rows = system.grid_state.win_rows if system.window_march else None

    rng = np.random.default_rng(0)
    img_idxs = rng.integers(0, len(train_ds.poses), B)
    pix_idxs = rng.integers(0, train_ds.directions.shape[0], B)
    poses = np.asarray(train_ds.poses)[img_idxs]
    dirs = np.asarray(train_ds.directions)[pix_idxs]
    rays_d = jnp.asarray(
        np.einsum("nij,nj->ni", poses[:, :, :3], dirs), jnp.float32)
    rays_o = jnp.asarray(poses[:, :, 3], jnp.float32)
    noise = jnp.asarray(rng.random(B), jnp.float32)
    bg = jnp.ones((3,), jnp.float32)

    from ngp_pl_tpu.models.rendering import (
        render_rays_train_rounds, scene_hits)

    if full:
        # rounds renderer fwd / fwd+bwd in isolation
        @jax.jit
        def rounds_fwd(params, occ, win_rows):
            out = render_rays_train_rounds(
                ngp, params, occ, rays_o, rays_d, noise, bg, rcfg=rcfg,
                n_samples=S, chain_length=chain, win_rows=win_rows)
            return out["rgb"].sum()
        timeit("rounds render fwd", rounds_fwd, params, occ, win_rows)

        @jax.jit
        def rounds_grad(params, occ, win_rows):
            def f(p):
                out = render_rays_train_rounds(
                    ngp, p, occ, rays_o, rays_d, noise, bg, rcfg=rcfg,
                    n_samples=S, chain_length=chain, win_rows=win_rows)
                return out["rgb"].sum()
            gt = jax.grad(f)(params)["hash_table"]
            return jnp.vdot(gt, gt)
        timeit("rounds render fwd+bwd", rounds_grad, params, occ, win_rows)

    # per-round march + field shapes
    from ngp_pl_tpu.ops.ray_march import march_rays_test_round

    hits = scene_hits(rays_o, rays_d, cfg.scale)
    t_end = hits[:, 1]
    t_cur0 = jnp.where(hits[:, 0] >= 0, hits[:, 0], t_end)

    for r in (range(4) if full else ()):
        slots = max(256, B >> r)
        ro, rd = rays_o[:slots], rays_d[:slots]
        tc, te = t_cur0[:slots], t_end[:slots]

        @jax.jit
        def march_r(win_rows, ro=ro, rd=rd, tc=tc, te=te, slots=slots):
            return march_rays_test_round(
                ro, rd, tc, te, occ, cascades=cfg.cascades, scale=cfg.scale,
                exp_step_factor=cfg.exp_step_factor, grid_size=cfg.grid_size,
                max_samples=rcfg.max_samples, n_samples=S,
                chain_length=chain, occ_rows=occ_rows, win_rows=win_rows)
        ts, dts, valid, t_next, n_eff = march_r(win_rows)
        timeit(f"march round (slots {slots} S {S})", march_r, win_rows)

        xyz = ro[:, None, :] + ts[..., None] * rd[:, None, :]

        @jax.jit
        def field_r(params, xyz=xyz, rd=rd):
            s, r_ = ngp.forward_rays(params, xyz, rd)
            return s.sum() + r_.sum()
        timeit(f"field fwd (slots {slots} S {S})", field_r, params)

        @jax.jit
        def field_g(params, xyz=xyz, rd=rd):
            def f(p):
                s, r_ = ngp.forward_rays(p, xyz, rd)
                return s.sum() + r_.sum()
            gt = jax.grad(f)(params)["hash_table"]
            return jnp.vdot(gt, gt)
        timeit(f"field fwd+bwd (slots {slots} S {S})", field_g, params)

    # encoder internals at the strided shape (B x S).  Every timed fn
    # reduces its output to a scalar INSIDE jit: the timing fence transfers
    # one float, not the (gigabyte) intermediate.
    total = B * S
    total = (total // 4096) * 4096
    print(f"encoder shapes: slot-samples {total}", file=sys.stderr)
    xs = jnp.asarray(rng.random((total, 3)), jnp.float32)
    from ngp_pl_tpu.ops.hash_encoding import (
        _slots_local_frac_lm, _meta_T, expand_w1, hash_encode_mlp)
    from ngp_pl_tpu.ops.hash_encoding_pallas import (
        pack_table_f16, encode_mlp_fwd_pallas, encode_mlp_bwd_pallas)

    spec = ngp.spec
    table = params["hash_table"]
    w1 = params["sigma_mlp"][0]
    L, W = spec.n_levels, spec.row_width

    @jax.jit
    def slots_fn(xs):
        slot, local, frac = _slots_local_frac_lm(xs, spec)
        return slot.sum() + _meta_T(local, frac, 1).sum()
    timeit("slots+meta (sum-fenced)", slots_fn, xs)

    @jax.jit
    def slots_keep(xs):
        slot, local, frac = _slots_local_frac_lm(xs, spec)
        return slot, _meta_T(local, frac, 1)
    slot, meta_T = jax.block_until_ready(slots_keep(xs))
    packed = jax.block_until_ready(jax.jit(pack_table_f16)(table))

    @jax.jit
    def gather_fn(packed, slot):
        return packed[slot.reshape(-1)].sum()
    timeit("packed-f16 row gather (L*N rows)", gather_fn, packed, slot)

    w1big = jax.block_until_ready(jax.jit(lambda w1: expand_w1(w1, spec))(w1))

    @jax.jit
    def gather_keep(packed, slot):
        return packed[slot.reshape(-1)].reshape(L, total, W // 2)
    rows = jax.block_until_ready(gather_keep(packed, slot))

    @jax.jit
    def pl_fwd(rows, meta_T, w1big):
        h1, ft2 = encode_mlp_fwd_pallas(rows, meta_T, w1big,
                                        F=spec.n_features, bn=4096)
        return h1.sum() + ft2.sum()
    timeit("pallas encode fwd (decode+wrow+mxu)", pl_fwd, rows, meta_T, w1big)

    g = jnp.asarray(rng.random((total, w1.shape[-1])), jnp.float32)

    @jax.jit
    def pl_bwd(meta_T, w1big, g):
        return encode_mlp_bwd_pallas(meta_T, w1big, g,
                                     F=spec.n_features,
                                     bn=4096).astype(jnp.float32).sum()
    timeit("pallas encode bwd (d_rows)", pl_bwd, meta_T, w1big, g)

    @jax.jit
    def bwd_keep(meta_T, w1big, g):
        return encode_mlp_bwd_pallas(meta_T, w1big, g,
                                     F=spec.n_features, bn=4096)
    d_rows = jax.block_until_ready(bwd_keep(meta_T, w1big, g))

    @jax.jit
    def scatter_fn(slot, d_rows):
        parts = []
        for l in range(L):
            parts.append(
                jnp.zeros((spec.sizes[l], W), jnp.float32)
                .at[slot[l] - spec.offsets[l]].add(
                    d_rows[l].astype(jnp.float32)))
        return sum(p.sum() for p in parts)
    timeit("per-level table scatter-add", scatter_fn, slot, d_rows)

    # fused encode+l1 via the public entry (gather + pallas fwd together)
    @jax.jit
    def enc_fwd(params, xs):
        return hash_encode_mlp(xs, params["hash_table"],
                               params["sigma_mlp"][0], spec,
                               need_x_grad=False).sum()
    timeit("encode+l1 fwd (public)", enc_fwd, params, xs)

    @jax.jit
    def enc_grad(params, xs):
        def f(p):
            return hash_encode_mlp(xs, p["hash_table"], p["sigma_mlp"][0],
                                   spec, need_x_grad=False).sum()
        gt = jax.grad(f)(params)["hash_table"]
        return jnp.vdot(gt, gt)
    timeit("encode+l1 fwd+bwd (public)", enc_grad, params, xs)

    # fused field tail fwd / fwd+bwd at the same shape
    from ngp_pl_tpu.ops.field_pallas import field_tail, _pick_bn as _tail_bn

    h1v = jax.block_until_ready(
        jax.jit(lambda p, xs: hash_encode_mlp(
            xs, p["hash_table"], p["sigma_mlp"][0], spec,
            need_x_grad=False))(params, xs))
    sh_t = jnp.asarray(rng.random((16, total)), jnp.float32)
    bn_t = _tail_bn(total)

    @jax.jit
    def tail_fwd(params, h1v, sh_t):
        wr3p = jnp.pad(params["rgb_mlp"][2], ((0, 0), (0, 5)))
        return field_tail(bn_t, h1v, sh_t, params["sigma_mlp"][1],
                          params["rgb_mlp"][0], params["rgb_mlp"][1],
                          wr3p).sum()
    timeit("field tail fwd", tail_fwd, params, h1v, sh_t)

    @jax.jit
    def tail_grad(params, h1v, sh_t):
        def f(h1x):
            wr3p = jnp.pad(params["rgb_mlp"][2], ((0, 0), (0, 5)))
            return field_tail(bn_t, h1x, sh_t, params["sigma_mlp"][1],
                              params["rgb_mlp"][0], params["rgb_mlp"][1],
                              wr3p).sum()
        return jnp.vdot(jax.grad(f)(h1v), h1v)
    timeit("field tail fwd+bwd(dh1)", tail_grad, params, h1v, sh_t)

    # strided composite fwd+bwd at (B, S)
    from ngp_pl_tpu.ops.volume_render import composite_train_strided

    sig = jnp.asarray(rng.random((B, S)), jnp.float32)
    rgbs = jnp.asarray(rng.random((3, B, S)), jnp.float32)
    dts2 = jnp.full((B, S), 1e-3, jnp.float32)
    ts2 = jnp.cumsum(dts2, axis=1)
    val2 = jnp.ones((B, S), bool)

    @jax.jit
    def comp_grad(sig, rgbs):
        def f(s, r):
            out = composite_train_strided(s, r, dts2, ts2, val2,
                                          T_threshold=rcfg.t_threshold)
            return out["rgb"].sum() + out["depth"].sum()
        gs, gr = jax.grad(f, argnums=(0, 1))(sig, rgbs)
        return gs.sum() + gr.sum()
    timeit("strided composite fwd+bwd", comp_grad, sig, rgbs)

    # strided march at the training shape
    from ngp_pl_tpu.models.rendering import render_rays_train
    from ngp_pl_tpu.ops.ray_march import march_rays_train_strided

    hits2 = scene_hits(rays_o, rays_d, cfg.scale)
    chain_tr = system.chain_length

    @jax.jit
    def march_str(win_rows):
        m = march_rays_train_strided(
            rays_o, rays_d, hits2, noise, None, cascades=cfg.cascades,
            scale=cfg.scale, exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
            n_samples=S, chain_length=chain_tr, win_rows=win_rows)
        return m.ts.sum() + m.total
    timeit(f"march strided (chain {chain_tr})", march_str, win_rows)

    @jax.jit
    def render_str_grad(params, occ, win_rows):
        def f(p):
            out = render_rays_train(
                ngp, p, occ, rays_o, rays_d, noise, bg, rcfg=rcfg,
                n_samples=S, chain_length=chain_tr, win_rows=win_rows)
            return out["rgb"].sum()
        gt = jax.grad(f)(params)["hash_table"]
        return jnp.vdot(gt, gt)
    timeit("strided render fwd+bwd", render_str_grad, params, occ, win_rows)

    # adam + grid for completeness
    def grid_update():
        return system.update_density_grid(
            params, system.grid_state, jax.random.PRNGKey(7),
            system.density_threshold, warmup=False, erode=False
        ).mean_density
    timeit("grid update (amortize /16)", grid_update, n=5)


if __name__ == "__main__":
    main()
