#!/usr/bin/env python
"""Round-4 micros: (1) true per-ray occupied-count distribution at steady
state, (2) table scatter-add variants, (3) pallas fwd algebra A/B."""
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:46s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    B = int(os.environ.get("PROF_BATCH", 8192))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=B,
                       num_epochs=30, exp_name="micro_r4", no_save_test=True,
                       train_layout="csr")
    train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
    test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
    system.on_train_start()
    for i in range(512 // 16):
        m = system.step_block()
    float(np.asarray(m["loss"]))

    ngp, cfg, rcfg = system.ngp, system.cfg, system.rcfg
    params = system.state.params
    win_rows = system.grid_state.win_rows

    rng = np.random.default_rng(0)
    img_idxs = rng.integers(0, len(train_ds.poses), B)
    pix_idxs = rng.integers(0, train_ds.directions.shape[0], B)
    poses = np.asarray(train_ds.poses)[img_idxs]
    dirs = np.asarray(train_ds.directions)[pix_idxs]
    rays_d = jnp.asarray(
        np.einsum("nij,nj->ni", poses[:, :, :3], dirs), jnp.float32)
    rays_o = jnp.asarray(poses[:, :, 3], jnp.float32)
    noise = jnp.asarray(rng.random(B), jnp.float32)

    # 1. per-ray occupied-count distribution (pre-clip)
    from ngp_pl_tpu.models.rendering import scene_hits
    from ngp_pl_tpu.ops.ray_march import march_rays_train_strided

    hits = scene_hits(rays_o, rays_d, cfg.scale)

    @jax.jit
    def counts_fn(win_rows):
        m = march_rays_train_strided(
            rays_o, rays_d, hits, noise, None, cascades=cfg.cascades,
            scale=cfg.scale, exp_step_factor=cfg.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=rcfg.max_samples,
            n_samples=8, chain_length=system.chain_full, win_rows=win_rows)
        return m.rm_counts
    c = np.asarray(counts_fn(win_rows))
    qs = [50, 75, 90, 95, 98, 99, 100]
    print("occupied-count percentiles:",
          {q: int(np.percentile(c, q)) for q in qs}, file=sys.stderr)
    print(f"mean {c.mean():.1f}; frac>16 {np.mean(c > 16):.3f}"
          f" frac>24 {np.mean(c > 24):.3f} frac>32 {np.mean(c > 32):.3f}"
          f" frac>64 {np.mean(c > 64):.3f}", file=sys.stderr)
    print(f"sample mass in rays>32: "
          f"{c[c > 32].sum() / max(c.sum(), 1):.3f}; "
          f">64: {c[c > 64].sum() / max(c.sum(), 1):.3f}", file=sys.stderr,
          flush=True)

    # 2. scatter variants at N=196608 per level
    spec = ngp.spec
    L, W = spec.n_levels, spec.row_width
    N = 196608
    xs = jnp.asarray(rng.random((N, 3)), jnp.float32)
    from ngp_pl_tpu.ops.hash_encoding import _slots_local_frac_lm

    slot = jax.block_until_ready(
        jax.jit(lambda xs: _slots_local_frac_lm(xs, spec)[0])(xs))
    d_bf = jnp.asarray(rng.random((L, N, W)), jnp.bfloat16)
    d_f32 = d_bf.astype(jnp.float32)

    @jax.jit
    def scat_f32(slot, d):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((spec.sizes[l], W), jnp.float32)
                         .at[slot[l] - spec.offsets[l]].add(d[l]))
        return sum(p.sum() for p in parts)
    timeit("scatter per-level f32 in, f32 target", scat_f32, slot, d_f32)

    @jax.jit
    def scat_bf_cast(slot, d):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((spec.sizes[l], W), jnp.float32)
                         .at[slot[l] - spec.offsets[l]]
                         .add(d[l].astype(jnp.float32)))
        return sum(p.sum() for p in parts)
    timeit("scatter per-level bf16 in (cast), f32 tgt", scat_bf_cast,
           slot, d_bf)

    @jax.jit
    def scat_bf_tgt(slot, d):
        parts = []
        for l in range(L):
            parts.append(jnp.zeros((spec.sizes[l], W), jnp.bfloat16)
                         .at[slot[l] - spec.offsets[l]].add(d[l]))
        return sum(p.astype(jnp.float32).sum() for p in parts)
    timeit("scatter per-level bf16 in, bf16 tgt", scat_bf_tgt, slot, d_bf)

    @jax.jit
    def scat_merged(slot, d):
        return (jnp.zeros((spec.total_rows, W), jnp.float32)
                .at[slot.reshape(-1)].add(
                    d.reshape(L * N, W).astype(jnp.float32))).sum()
    timeit("scatter merged (all levels, one call)", scat_merged, slot, d_bf)

    # one level in isolation: coarse (dup-heavy) vs fine (mostly unique)
    for l in (0, 2, 3, 7):
        dl = d_bf[l]
        sl = slot[l] - spec.offsets[l]

        @jax.jit
        def scat_one(sl, dl, l=l):
            return (jnp.zeros((spec.sizes[l], W), jnp.float32)
                    .at[sl].add(dl.astype(jnp.float32))).sum()
        timeit(f"scatter level {l} (rows {spec.sizes[l]})", scat_one, sl, dl)

        # presorted rows: measures whether index locality matters
        sl_sorted = jnp.sort(sl)

        @jax.jit
        def scat_sorted(sl, dl, l=l):
            return (jnp.zeros((spec.sizes[l], W), jnp.float32)
                    .at[sl].add(dl.astype(jnp.float32))).sum()
        timeit(f"scatter level {l} PRESORTED idx", scat_sorted, sl_sorted, dl)

    # 3. gather at half the rows (level-pairing upper bound)
    packed = jnp.zeros((spec.total_rows, W // 2), jnp.uint32)

    @jax.jit
    def gath8(packed, slot):
        return packed[slot.reshape(-1)].sum()
    timeit("gather 8 x N packed rows", gath8, packed, slot)

    @jax.jit
    def gath4(packed, slot):
        return packed[slot[:4].reshape(-1)].sum()
    timeit("gather 4 x N packed rows", gath4, packed, slot)

    packed_wide = jnp.zeros((spec.total_rows, W), jnp.uint32)

    @jax.jit
    def gath4w(packed_wide, slot):
        return packed_wide[slot[:4].reshape(-1)].sum()
    timeit("gather 4 x N DOUBLE-wide packed rows", gath4w, packed_wide, slot)


if __name__ == "__main__":
    main()
