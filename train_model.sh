#!/bin/sh
#
# The model training runner (TPU-native). Canonical hyperparameters follow
# the reference wrapper; --synthetic N trains on generated tiles when no
# dataset directory is available.
#
help () {
    echo
    echo "The model training script"
    echo "Usage:"
    echo "      train_model.sh [data_dir]"
    echo
}

DATA_DIR=${1:-./data1}

/usr/bin/env python3 -m plastic_unet_tpu.cli.train \
    --epochs 5 --save_every 50 --validate_every 1 \
    --learning-rate 3e-4 --step-lr 1e5 \
    --max-train-time -1 --rollout_every 100 \
    --prule hebb \
    --data "$DATA_DIR" --out ./out --debug
