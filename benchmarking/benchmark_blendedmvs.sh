#!/bin/bash
# BlendedMVS benchmark recipe (reference benchmarking/benchmark_blendedmvs.sh).
export ROOT_DIR=${ROOT_DIR:-/data/BlendedMVS}

for SCENE in Character Fountain Jade Statues; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --dataset_name nsvf \
        --exp_name "$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --scale 4.0
done
