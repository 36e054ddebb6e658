#!/bin/bash
# Synthetic-NeRF benchmark recipe (reference benchmarking/benchmark_synthetic_nerf.sh):
# 20 epochs, batch 16384, lr 2e-2, LPIPS eval.
export ROOT_DIR=${ROOT_DIR:-/data/Synthetic_NeRF}

# SMOKE=1: CI path — one tiny hermetic run on the procedural scene with the
# same recipe flags (no dataset egress in CI; tests/test_cli.py invokes this)
if [ -n "$SMOKE" ]; then
    exec python "$(dirname "$0")/../train.py" \
        --root_dir "" --dataset_name synthetic --exp_name smoke_recipe \
        --num_epochs 1 --iters_per_epoch 48 --batch_size 1024 --lr 2e-2 \
        --downsample 0.25 --no_save_test --num_devices 1
fi

for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --dataset_name nsvf \
        --exp_name "$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --eval_lpips
done
