#!/bin/bash
# mipnerf360 benchmark recipe (reference benchmarking/benchmark_mipnerf360.sh):
# colmap loader, downsample 0.25, large scale, distortion loss, random bg.
export ROOT_DIR=${ROOT_DIR:-/data/360_v2}

declare -A SCALE=( [bicycle]=16 [bonsai]=8 [counter]=8 [garden]=16 \
                   [kitchen]=8 [room]=8 [stump]=64 )
for SCENE in "${!SCALE[@]}"; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --dataset_name colmap \
        --exp_name "$SCENE" \
        --downsample 0.25 \
        --num_epochs 20 --batch_size 4096 --scale "${SCALE[$SCENE]}" \
        --distortion_loss_w 1e-3 --random_bg
done
