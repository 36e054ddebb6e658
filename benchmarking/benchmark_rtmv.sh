#!/bin/bash
# RTMV benchmark recipe (reference benchmarking/benchmark_rtmv.sh).
export ROOT_DIR=${ROOT_DIR:-/data/RTMV}

for ENV in bricks google_scanned abc amazon_berkeley; do
    for SCENE_DIR in "$ROOT_DIR/$ENV"/*/; do
        SCENE=$(basename "$SCENE_DIR")
        python train.py \
            --root_dir "$SCENE_DIR" \
            --dataset_name rtmv \
            --exp_name "$ENV/$SCENE" \
            --num_epochs 20 --batch_size 16384 --lr 2e-2
    done
done
