"""The jitted training step — the replacement for Lightning's loop body
(reference train.py:159-185 + the autograd machinery underneath).

One fused XLA program per step: ray generation from (pose, pixel) indices ->
AABB intersect -> occupancy march -> field -> composite -> losses -> grads ->
Adam update.  Optional camera-pose refinement (reference train.py:86-89,
117-122) optimizes per-image (dR, dT) with a separate hard-coded 1e-6 lr via
optax.multi_transform.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ngp_pl_tpu.config import RenderConfig, TrainConfig
from ngp_pl_tpu.datasets.ray_utils import axisangle_to_R, get_rays
from ngp_pl_tpu.models.ngp import NGP, _mlp_apply
from ngp_pl_tpu.models.rendering import (
    render_rays_train,
    render_rays_train_csr,
    render_rays_train_rounds,
)
from ngp_pl_tpu.ops.ray_march import _q99, _qtile
from ngp_pl_tpu.ops.trunc_exp import trunc_exp
from ngp_pl_tpu.training.losses import nerf_loss, total_loss


class TrainState(NamedTuple):
    params: Any                  # NGP param pytree
    pose_params: Any             # {'dR','dT'} (N_img, 3) or None-like empty dict
    opt_state: Any
    step: jnp.ndarray            # () int32


def cosine_epoch_schedule(lr: float, num_epochs: int, iters_per_epoch: int,
                          final_div: float):
    """Per-epoch staircase cosine lr -> lr/final_div
    (reference train.py:135-137: CosineAnnealingLR stepped per epoch)."""
    eta_min = lr / final_div

    def schedule(step):
        epoch = jnp.minimum(step // iters_per_epoch, num_epochs)
        cos = jnp.cos(jnp.pi * epoch.astype(jnp.float32) / num_epochs)
        return eta_min + 0.5 * (lr - eta_min) * (1.0 + cos)

    return schedule


def make_optimizer(tcfg: TrainConfig):
    net_opt = optax.adam(
        learning_rate=cosine_epoch_schedule(
            tcfg.lr, tcfg.num_epochs, tcfg.iters_per_epoch, tcfg.lr_final_div),
        eps=tcfg.adam_eps,
    )
    if tcfg.optimize_ext:
        pose_opt = optax.adam(tcfg.pose_lr)
        return optax.multi_transform(
            {"net": net_opt, "pose": pose_opt},
            {"net": "net", "pose": "pose"},
        )
    return net_opt


def init_train_state(ngp: NGP, tcfg: TrainConfig, key, n_images: int
                     ) -> TrainState:
    params = ngp.init(key)
    if tcfg.optimize_ext:
        pose_params = {
            "dR": jnp.zeros((n_images, 3), jnp.float32),
            "dT": jnp.zeros((n_images, 3), jnp.float32),
        }
        trainable = {"net": params, "pose": pose_params}
    else:
        pose_params = {}
        trainable = params
    opt_state = make_optimizer(tcfg).init(trainable)
    return TrainState(params=params, pose_params=pose_params,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def apply_pose_refinement(poses, pose_params, img_idxs):
    """poses: (B, 3, 4) base c2w; adds learned dR/dT (train.py:86-89)."""
    dR = axisangle_to_R(pose_params["dR"][img_idxs])          # (B, 3, 3)
    R = dR @ poses[:, :, :3]
    t = poses[:, :, 3] + pose_params["dT"][img_idxs]
    return jnp.concatenate([R, t[:, :, None]], axis=-1)


def make_train_step(ngp: NGP, tcfg: TrainConfig, rcfg: RenderConfig,
                    unit_exposure_rgb: float = 0.5, batch_sharding=None):
    """Returns train_step(state, occ_grid, poses, directions, batch, key).

    batch_sharding: optional NamedSharding(P('data')) — applied as a
    sharding constraint to on-device-sampled batches so each chip renders
    its slice of the global batch (the DP split the reference gets from
    Lightning DDP's per-rank loaders, train.py:271-272)."""
    optimizer = make_optimizer(tcfg)
    use_pose = tcfg.optimize_ext
    use_exposure = tcfg.use_exposure

    def loss_fn(trainable, occ_grid, occ_rows, win_rows,
                poses_all, directions, batch, key, n_samples,
                chain_length, layout):
        if use_pose:
            params, pose_params = trainable["net"], trainable["pose"]
        else:
            params, pose_params = trainable, None

        poses = poses_all[batch["img_idxs"]]                 # (B, 3, 4)
        if use_pose:
            poses = apply_pose_refinement(poses, pose_params,
                                          batch["img_idxs"])
        dirs = directions[batch["pix_idxs"]]
        rays_o, rays_d = get_rays(dirs, poses)

        k_noise, k_bg = jax.random.split(key)
        noise = jax.random.uniform(k_noise, (rays_o.shape[0],))
        if ngp.cfg.exp_step_factor == 0:                      # synthetic: white
            bg = jnp.ones((3,), jnp.float32)
        elif tcfg.random_bg:
            bg = jax.random.uniform(k_bg, (3,), jnp.float32)
        else:
            bg = jnp.zeros((3,), jnp.float32)

        exposure = batch.get("exposure") if use_exposure else None
        if layout == "csr":
            # CSR pool: total budget N * n_samples shared by need — covers
            # heavy-tailed per-ray demand at mean cost (rendering.py:197)
            results = render_rays_train_csr(
                ngp, params, occ_grid, rays_o, rays_d, noise, bg,
                rcfg=rcfg, exposure=exposure,
                pool_mult=n_samples or None, chain_length=chain_length,
                occ_rows=occ_rows, win_rows=win_rows)
        elif layout == "rounds":
            # multi-round strided render: pays ~the effective sample count
            # (see render_rays_train_rounds)
            results = render_rays_train_rounds(
                ngp, params, occ_grid, rays_o, rays_d, noise, bg,
                rcfg=rcfg, exposure=exposure,
                n_samples=n_samples or 16,
                chain_length=chain_length or 512,
                lambda_distortion=tcfg.distortion_loss_w,
                occ_rows=occ_rows, win_rows=win_rows)
        else:
            results = render_rays_train(
                ngp, params, occ_grid, rays_o, rays_d, noise, bg,
                rcfg=rcfg, exposure=exposure, n_samples=n_samples or None,
                chain_length=chain_length,
                occ_rows=occ_rows, win_rows=win_rows)

        loss_d = nerf_loss(
            results, batch["rgb"],
            lambda_opacity=tcfg.opacity_loss_w,
            lambda_distortion=tcfg.distortion_loss_w,
        )
        if use_exposure:
            # anchor the tonemappers at unit exposure (train.py:166-172)
            zero_rad = jnp.zeros((1, 1), jnp.float32)
            chans = [
                _mlp_apply(params["tonemapper"][i], zero_rad, ngp.dtype,
                           out_act=jax.nn.sigmoid)
                for i in range(3)
            ]
            unit_rgb = jnp.concatenate(chans, axis=-1)
            loss_d["unit_exposure"] = 0.5 * (unit_rgb - unit_exposure_rgb) ** 2

        loss = total_loss(loss_d)
        aux = {
            "loss": loss,
            "rgb": results["rgb"],
            "rm_samples": results["rm_samples"],
            "vr_samples": results["vr_samples"],
            "rm_counts_max": results["rm_counts"].max(),
            "rm_counts_q": _q99(results["rm_counts"]),
            # PRE-clip per-ray mean: rm_samples saturates at the pool/S
            # budget, so sizing from it locks into the clipped regime (the
            # round-4 limit cycle); per-ray rm_counts are never pool-clipped
            "rm_counts_mean": results["rm_counts"].astype(jnp.float32).mean(),
            "vr_counts_q": _q99(results["vr_counts"]),
            "vr_counts_q90": _qtile(results["vr_counts"], 0.90),
            "vr_counts_mean": results["vr_counts"].astype(jnp.float32).mean(),
            "rounds_alive_end": results.get(
                "rounds_alive_end", jnp.zeros((), jnp.int32)),
            "chain_demand": results["chain_demand"],
            "chain_demand_q": results["chain_demand_q"],
        }
        return loss, aux

    def _step_core(state, occ_grid, occ_rows, win_rows,
                   poses_all, directions, batch, key, n_samples,
                   chain_length, layout):
        if use_pose:
            trainable = {"net": state.params, "pose": state.pose_params}
        else:
            trainable = state.params
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, occ_grid, occ_rows, win_rows, poses_all,
            directions, batch, key, n_samples, chain_length, layout)
        # Non-finite-gradient step skip — the semantics the reference gets
        # for free from Lightning AMP's GradScaler (train.py precision=16:
        # a step whose grads contain inf/NaN is skipped, optimizer state
        # untouched).  Without it one transient forward blow-up poisons
        # Adam's moments and the run is irrecoverable (observed: 30k-step
        # procedural runs died at ~step 12.2k).  Costs one isfinite
        # reduction per leaf; keeps the opt-state tree layout unchanged.
        grads_finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        updates, opt_state_new = optimizer.update(
            grads, state.opt_state, trainable)
        # On a skipped step revert the moment tensors but let the `count`
        # leaves advance: the reference's CosineAnnealingLR is stepped per
        # epoch by Lightning regardless of GradScaler skips, so under
        # sustained skipping the lr must keep decaying (advisor r4). The
        # count leaves of ScaleByAdamState / scale_by_schedule are finite
        # integers regardless of grad content, so keeping `n` is safe.
        def _keep_count(path, n, o):
            if any(getattr(p, "name", None) == "count" for p in path):
                return n
            return jnp.where(grads_finite, n, o)

        opt_state = jax.tree_util.tree_map_with_path(
            _keep_count, opt_state_new, state.opt_state)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(grads_finite, u, jnp.zeros_like(u)), updates)
        trainable = optax.apply_updates(trainable, updates)
        if use_pose:
            params, pose_params = trainable["net"], trainable["pose"]
        else:
            params, pose_params = trainable, state.pose_params
        psnr = -10.0 * jnp.log10(
            jnp.mean((aux["rgb"] - batch["rgb"]) ** 2))
        metrics = {
            "loss": loss,
            "psnr": psnr,
            "grads_finite": grads_finite,
            "n_skipped": (~grads_finite).astype(jnp.int32),
            "rm_samples": aux["rm_samples"],
            "vr_samples": aux["vr_samples"],
            "rm_counts_max": aux["rm_counts_max"],
            "chain_demand": aux["chain_demand"],
            "chain_demand_q": aux["chain_demand_q"],
            # one packed vector so the host's budget feedback costs a single
            # (async-prefetched) transfer instead of one RT per scalar
            "demand_vec": jnp.stack([
                aux["rm_samples"].astype(jnp.float32),
                aux["chain_demand"].astype(jnp.float32),
                aux["chain_demand_q"].astype(jnp.float32),
                aux["rm_counts_q"].astype(jnp.float32),
                aux["vr_counts_q"].astype(jnp.float32),
                aux["vr_counts_q90"].astype(jnp.float32),
                aux["vr_counts_mean"],
                aux["rounds_alive_end"].astype(jnp.float32),
                aux["rm_counts_mean"],
            ]),
        }
        return (
            TrainState(params=params, pose_params=pose_params,
                       opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    @partial(jax.jit,
             static_argnames=("n_samples", "chain_length", "layout"))
    def train_step(state: TrainState, occ_grid, poses_all, directions, batch,
                   key, n_samples: int = 0, chain_length: int = 0,
                   occ_rows=None, win_rows=None, layout: str = "strided"
                   ) -> tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(key, state.step)
        return _step_core(state, occ_grid, occ_rows, win_rows,
                          poses_all, directions, batch, key, n_samples,
                          chain_length, layout)

    def _device_step_core(state, occ_grid, poses_all, directions, rays_store,
                          key, n_samples, chain_length,
                          occ_rows, win_rows, layout):
        key = jax.random.fold_in(key, state.step)
        k_img, k_pix, key = jax.random.split(key, 3)
        B = tcfg.batch_size
        n_img, n_pix = rays_store.shape[0], rays_store.shape[1]
        if tcfg.ray_sampling_strategy == "same_image":
            img_idxs = jnp.broadcast_to(
                jax.random.randint(k_img, (1,), 0, n_img), (B,)
            ).astype(jnp.int32)
        else:                                    # all_images
            img_idxs = jax.random.randint(
                k_img, (B,), 0, n_img, dtype=jnp.int32)
        pix_idxs = jax.random.randint(k_pix, (B,), 0, n_pix, dtype=jnp.int32)
        if batch_sharding is not None:
            img_idxs = jax.lax.with_sharding_constraint(
                img_idxs, batch_sharding)
            pix_idxs = jax.lax.with_sharding_constraint(
                pix_idxs, batch_sharding)
        payload = rays_store[img_idxs, pix_idxs]          # (B, C) row gather
        batch = {"img_idxs": img_idxs, "pix_idxs": pix_idxs,
                 "rgb": payload[:, :3]}
        if use_exposure and rays_store.shape[-1] >= 4:
            batch["exposure"] = payload[:, 3:4]
        return _step_core(state, occ_grid, occ_rows, win_rows,
                          poses_all, directions, batch, key, n_samples,
                          chain_length, layout)

    @partial(jax.jit,
             static_argnames=("n_samples", "chain_length", "layout"))
    def train_step_device(state: TrainState, occ_grid, poses_all, directions,
                          rays_store, key, n_samples: int = 0,
                          chain_length: int = 0,
                          occ_rows=None, win_rows=None,
                          layout: str = "strided"
                          ) -> tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Fully on-device step: batch sampling happens INSIDE the program.

        `rays_store` is the whole (N_images, H*W, C) training ray tensor kept
        resident in HBM; (image, pixel) indices are drawn with the on-device
        RNG, so the hot loop involves zero host->device data movement (the
        reference instead streams CPU-sampled batches from 16 DataLoader
        workers every step, train.py:141-152)."""
        return _device_step_core(state, occ_grid, poses_all, directions,
                                 rays_store, key, n_samples, chain_length,
                                 occ_rows, win_rows, layout)

    @partial(jax.jit,
             static_argnames=("n_samples", "chain_length", "n_steps",
                              "layout"))
    def train_step_block(state: TrainState, occ_grid, poses_all, directions,
                         rays_store, key, n_samples: int = 0,
                         chain_length: int = 0,
                         occ_rows=None, win_rows=None,
                         n_steps: int = 16, layout: str = "strided"
                         ) -> tuple[TrainState, Dict[str, jnp.ndarray]]:
        """`n_steps` device-resident steps as ONE lax.scan program.

        The occupancy grid is constant within a block (the reference updates
        it every 16 steps, train.py:159-163 — callers set n_steps to that
        cadence), and pool/chain buckets only change at block boundaries, so
        scanning is semantically identical to n_steps dispatches while
        paying the host->device dispatch latency once.  Metrics: last step's
        values, except the demand vector which is the per-element MAX over
        the block (bucket feedback wants the block's worst case)."""

        def one(st, _):
            st, m = _device_step_core(
                st, occ_grid, poses_all, directions, rays_store, key,
                n_samples, chain_length, occ_rows, win_rows, layout)
            return st, m

        state, ms = jax.lax.scan(one, state, None, length=n_steps)
        metrics = {k: v[-1] for k, v in ms.items()}
        # nan_to_num with posinf/neginf=0: any non-finite step (NaN or inf)
        # must contribute NOTHING to the block max that feeds the host's
        # bucket controller (the default would map inf -> 3.4e38 and
        # dominate the sticky demand for many decay intervals)
        metrics["demand_vec"] = jnp.nan_to_num(
            ms["demand_vec"], posinf=0.0, neginf=0.0).max(axis=0)
        metrics["rm_samples"] = ms["rm_samples"].max(axis=0)
        metrics["grads_finite"] = ms["grads_finite"].all()
        # skip telemetry: how many of the block's steps were skipped by the
        # non-finite gate — a sustained skip-storm is a silent training
        # stall and must be visible to the host loop / logs
        metrics["n_skipped"] = (~ms["grads_finite"]).sum().astype(jnp.int32)
        return state, metrics

    train_step.device_variant = train_step_device
    train_step.block_variant = train_step_block
    return train_step
