#!/bin/bash
# NeRF++ (unbounded real) benchmark recipe (reference benchmarking/benchmark_nerfpp.sh).
export ROOT_DIR=${ROOT_DIR:-/data/nerf_pp}

for SCENE in tat_intermediate_M60 tat_intermediate_Playground \
             tat_intermediate_Train tat_training_Truck; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --dataset_name nerfpp \
        --exp_name "$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --scale 4.0 \
        --random_bg
done
