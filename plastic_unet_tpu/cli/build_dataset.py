"""Dataset-build CLI — flag-compatible with the reference img_utils CLI
(src/utils/img_utils.py:102-121). Run:
python3 -m plastic_unet_tpu.cli.build_dataset --data <dir>"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Build the resized-image HDF5 dataset")
    p.add_argument("--action", dest="action", default="create_dataset", type=str, help="the action to be performed")
    p.add_argument("-i", "--data", dest="data_dir", type=str, required=True, help="the directory with input data")
    p.add_argument("--check-plot", action="store_true", default=False,
                   help="show the random sample/mask spot-check plot (blocking, as in the reference)")
    args = p.parse_args(argv)

    if args.action == "create_dataset":
        from plastic_unet_tpu.data.hdf5_io import create_hdf5_data_set

        create_hdf5_data_set(data_dir=args.data_dir, show_check_plot=args.check_plot)
    else:
        raise ValueError("Usuported action requested: %s" % args.action)


if __name__ == "__main__":
    main()
