#!/bin/sh
#
# The script to visualize training data points collected (TPU-native rebuild).
#
help () {
    echo
    echo "The script to visualize collected train data points from HDF5"
    echo "Usage:"
    echo "      vis_train_data.sh data_file [window_size] [runs_per_epoch]"
    echo
}

if [ "$#" -lt 1 ]; then
    help
    exit 0
fi

w_size=1000
if [ "$#" -ge 2 ]; then
    w_size=$2
fi

runs=-1
if [ "$#" -eq 3 ]; then
    runs=$3
fi

/usr/bin/env python3 -m plastic_unet_tpu.cli.visualize --data-file "$1" --avg-window-size "$w_size" --runs-per-epoch "$runs"
