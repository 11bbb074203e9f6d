#!/bin/sh
#
# The mask images inference runner (TPU-native).
#
help () {
    echo
    echo "The masks inference script"
    echo "Usage:"
    echo "      infer_masks.sh [data_dir]"
    echo
}

DATA_DIR=${1:-./data1}

/usr/bin/env python3 -m plastic_unet_tpu.cli.infer \
    --model ./out/train_net.pth \
    --data "$DATA_DIR" --out ./out \
    --mask-threshold 0.5 \
    --visualize --save
