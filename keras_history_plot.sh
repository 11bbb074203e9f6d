#!/bin/sh
#
# The script to run training-history visualization (TPU-native rebuild).
#
help () {
    echo
    echo "The script to visualize a pickled training history"
    echo "Usage:"
    echo "     keras_history_plot.sh data_file"
    echo
}

if [ "$#" -lt 1 ]; then
    help
    exit 0
fi

/usr/bin/env python3 -m plastic_unet_tpu.cli.keras_history --data-file "$1"
