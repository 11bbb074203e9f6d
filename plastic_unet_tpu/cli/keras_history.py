"""History-plot CLI — flag-compatible with the reference
(src/utils/keras_history_visualization.py:43-57). Run:
python3 -m plastic_unet_tpu.cli.keras_history -f model_history.pickle"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Visualize a pickled training history")
    p.add_argument("--data-file", "-f", required=True, help="the path to the data file")
    args = p.parse_args(argv)

    from plastic_unet_tpu.viz.plots import plot_history

    plot_history(hist_file=args.data_file)


if __name__ == "__main__":
    main()
