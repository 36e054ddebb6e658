"""Configuration for the TPU-native NGP framework.

Mirrors the flag surface of the reference CLI (reference opt.py:3-70) plus the
derived constants the reference hard-codes in code rather than flags
(reference train.py:95-96, models/networks.py:26-33, models/rendering.py:7-8),
and adds the TPU-specific knobs that have no reference analogue (sample-pool
budget, mesh axes, dtypes).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

# Constants shared with the reference renderer (reference models/rendering.py:7-8,
# models/csrc/raymarching.cu:4).
MAX_SAMPLES = 1024
NEAR_DISTANCE = 0.01
SQRT3 = math.sqrt(3.0)


@dataclass(frozen=True)
class NGPConfig:
    """Static model hyperparameters (reference models/networks.py:13-92).

    Frozen + hashable so it can be closed over by jitted functions.
    """

    scale: float = 0.5
    # hash encoding (reference networks.py:32-56)
    n_levels: int = 16              # L
    n_features_per_level: int = 2   # F
    log2_hashmap_size: int = 19     # T = 2**19
    base_resolution: int = 16       # N_min
    max_resolution_factor: float = 2048.0  # N_max = factor * scale
    # density / rgb MLPs (reference networks.py:48-77)
    sigma_hidden: int = 64
    sigma_layers: int = 1
    geo_features: int = 16          # xyz_encoder output dims
    rgb_hidden: int = 64
    rgb_layers: int = 2
    sh_degree: int = 4              # direction encoding (reference networks.py:58-65)
    rgb_act: str = "Sigmoid"        # 'Sigmoid' | 'None' (HDR mode, networks.py:79-92)
    # occupancy grid (reference networks.py:25-29)
    grid_size: int = 128
    # compute dtype for MLP matmuls (hash table and accumulators stay fp32)
    mlp_dtype: str = "bfloat16"

    @property
    def cascades(self) -> int:
        # reference networks.py:26
        return max(1 + int(math.ceil(math.log2(2 * self.scale))), 1)

    @property
    def hashmap_size(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def per_level_scale(self) -> float:
        # b = exp(ln(N_max/N_min)/(L-1)), reference networks.py:33
        return math.exp(
            math.log(self.max_resolution_factor * self.scale / self.base_resolution)
            / (self.n_levels - 1)
        )

    @property
    def level_resolutions(self) -> Tuple[int, ...]:
        """Per-level grid resolution N_l = floor(N_min * b**l)."""
        b = self.per_level_scale
        return tuple(
            int(self.base_resolution * (b ** l)) for l in range(self.n_levels)
        )

    @property
    def exp_step_factor(self) -> float:
        # reference train.py:95-96: 1/256 iff scale > 0.5 (unbounded/real scenes)
        return 1.0 / 256.0 if self.scale > 0.5 else 0.0


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering-path parameters.

    The reference caps at MAX_SAMPLES=1024 samples per ray and compacts
    variable-length sample lists with atomics (models/csrc/raymarching.cu:237-241).
    The TPU design instead marches the closed-form t-chain fully in parallel and
    compacts into a fixed flat sample pool by prefix sum; these are the static
    budgets that replace the dynamic shapes.
    """

    max_samples: int = MAX_SAMPLES           # t-chain length cap per ray
    t_threshold: float = 1e-4                # early-termination transmittance
    # flat sample-pool size as a multiple of the ray batch, train path
    train_pool_mult: int = 32
    # test path marches in rounds of this many samples per ray
    test_round_samples: int = 64
    test_t_threshold: float = 1e-4


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors reference opt.py flags + Lightning-side constants."""

    # dataset (opt.py:6-16)
    root_dir: str = ""
    dataset_name: str = "nsvf"  # nerf|nsvf|colmap|nerfpp|rtmv|synthetic
    split: str = "train"        # train|trainval|trainvaltest
    downsample: float = 1.0
    # model (opt.py:18-22)
    scale: float = 0.5
    use_exposure: bool = False
    # hash-table geometry.  The reference hard-codes (L=16, F=2, T=2^19)
    # (networks.py:32-56); the default here is the equal-parameter TPU
    # variant (L=8, F=4): 108-float brick rows fill one native 128-lane
    # tile, halving the encoder's per-sample gather/scatter row count.
    # Measured on the procedural scene (benchmarking/ablate_geom.py,
    # 1536 steps): L16F2 79.8k rays/s psnr 30.88 ssim 0.937 vs
    # L8F4 142.3k rays/s psnr 30.82 ssim 0.939.  Pass
    # `--n_levels 16 --n_features 2` for the exact reference geometry.
    n_levels: int = 8
    n_features: int = 4
    log2_hashmap_size: int = 19
    # loss (opt.py:24-29, losses.py:42-45)
    distortion_loss_w: float = 0.0
    opacity_loss_w: float = 1e-3
    # training (opt.py:31-52)
    batch_size: int = 8192
    ray_sampling_strategy: str = "all_images"  # all_images|same_image
    num_epochs: int = 30
    iters_per_epoch: int = 1000                # reference datasets/base.py:17-20
    lr: float = 1e-2
    optimize_ext: bool = False
    random_bg: bool = False
    # optimizer constants (reference train.py:131-137)
    adam_eps: float = 1e-15
    lr_final_div: float = 30.0                 # cosine anneal floor = lr/30
    pose_lr: float = 1e-6                      # reference train.py:128
    # density-grid cadence (reference train.py:58-59, 160-163)
    grid_update_interval: int = 16
    grid_warmup_steps: int = 256
    density_decay: float = 0.95
    # validation (opt.py:54-60)
    eval_lpips: bool = False
    val_only: bool = False
    no_save_test: bool = False
    # misc (opt.py:62-69)
    exp_name: str = "exp"
    ckpt_path: Optional[str] = None
    weight_path: Optional[str] = None
    seed: int = 1337
    # train-time sample layout: "auto" (CSR during grid warmup, then the
    # multi-round strided render), or pin "rounds" / "csr" / "strided"
    train_layout: str = "auto"
    # TPU specifics (reference opt.py:42-43 --num_gpus)
    mesh_data_axis: str = "data"
    num_devices: int = 0       # 0 = use ALL visible devices (data mesh); N>0
                               # = first N devices (1 disables the mesh)
    log_every: int = 100
    # device-resident ray store: sample batches inside the jitted step
    # (no per-step host->device transfer) when the rays fit this budget
    device_dataset: bool = True
    device_dataset_max_bytes: int = 4 << 30

    @property
    def max_steps(self) -> int:
        return self.num_epochs * self.iters_per_epoch

    def ngp_config(self) -> NGPConfig:
        return NGPConfig(
            scale=self.scale,
            rgb_act="None" if self.use_exposure else "Sigmoid",
            n_levels=self.n_levels,
            n_features_per_level=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
        )

    def render_config(self) -> RenderConfig:
        return RenderConfig()

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def add_train_args(parser) -> None:
    """argparse surface compatible with the reference CLI (opt.py:3-70)."""
    d = TrainConfig()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, default=d.dataset_name,
                        choices=["nerf", "nsvf", "colmap", "nerfpp", "rtmv",
                                 "synthetic"])
    parser.add_argument("--split", type=str, default=d.split,
                        choices=["train", "trainval", "trainvaltest"])
    parser.add_argument("--downsample", type=float, default=d.downsample)
    parser.add_argument("--scale", type=float, default=d.scale)
    parser.add_argument("--use_exposure", action="store_true")
    parser.add_argument("--n_levels", type=int, default=d.n_levels,
                        help="hash-encoding levels L (reference: 16)")
    parser.add_argument("--n_features", type=int, default=d.n_features,
                        help="features per level F in {2, 4}; (L=8, F=4) is "
                             "the TPU-native equal-budget variant")
    parser.add_argument("--log2_hashmap_size", type=int,
                        default=d.log2_hashmap_size)
    parser.add_argument("--distortion_loss_w", type=float, default=d.distortion_loss_w)
    parser.add_argument("--batch_size", type=int, default=d.batch_size)
    parser.add_argument("--ray_sampling_strategy", type=str,
                        default=d.ray_sampling_strategy,
                        choices=["all_images", "same_image"])
    parser.add_argument("--num_epochs", type=int, default=d.num_epochs)
    parser.add_argument("--iters_per_epoch", type=int, default=d.iters_per_epoch,
                        help="steps per virtual epoch (reference fixes 1000)")
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--optimize_ext", action="store_true")
    parser.add_argument("--random_bg", action="store_true")
    parser.add_argument("--eval_lpips", action="store_true")
    parser.add_argument("--val_only", action="store_true")
    parser.add_argument("--no_save_test", action="store_true")
    parser.add_argument("--exp_name", type=str, default=d.exp_name)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--weight_path", type=str, default=None)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--train_layout", type=str, default=d.train_layout,
                        choices=["auto", "rounds", "csr", "strided"],
                        help="train-time sample layout (auto: CSR warmup "
                             "then multi-round strided)")
    parser.add_argument("--num_devices", type=int, default=d.num_devices,
                        help="devices for the data mesh; 0 = all visible "
                             "(reference opt.py --num_gpus)")


def config_from_args(args) -> TrainConfig:
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in vars(args).items() if k in known and v is not None}
    return TrainConfig(**kw)
