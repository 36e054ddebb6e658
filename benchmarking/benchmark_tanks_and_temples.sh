#!/bin/bash
# TanksAndTemples benchmark recipe (reference benchmarking/benchmark_tanksandtemples.sh):
# real scenes, scale 4, black->white bg scenes handled by the loader.
export ROOT_DIR=${ROOT_DIR:-/data/TanksAndTemple}

for SCENE in Barn Caterpillar Family Ignatius Truck; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --dataset_name nsvf \
        --exp_name "$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --scale 4.0
done
