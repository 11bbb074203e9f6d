"""Evaluation CLI — flag-compatible with the reference (src/eval.py:106-124):
load a model, compute the best threshold + IoU on validation.
Run: python3 -m plastic_unet_tpu.cli.eval ..."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Score the model and find the best IoU threshold")
    p.add_argument("--model", "-m", default="MODEL.pth", help="file in which the model is stored (default: 'MODEL.pth')")
    p.add_argument("-i", "--data", dest="data_dir", type=str, help="the directory with input test data")
    p.add_argument("-g", "--gpu", action="store_true", dest="gpu", default=False,
                   help="accepted for reference compatibility; accelerator auto-selected")
    p.add_argument("-v", "--debug", action="store_true", dest="debug", default=False, help="show debug information")
    p.add_argument("--arch", default="unet_res", choices=["unet_res", "unet"])
    p.add_argument("--neurons", default=16, type=int)
    p.add_argument("--prule", default="hebb")
    p.add_argument("--precision", default="perf")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    img_width = img_height = 101

    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    img_chan = 1

    import numpy as np

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.dataset import load_train_dataset
    from plastic_unet_tpu.eval.evaluate import score_model_best_iou
    from plastic_unet_tpu.train.driver import build_model, name_map_for
    from plastic_unet_tpu.utils.precision import matmul_precision
    from plastic_unet_tpu.utils.torch_interop import load_pth, state_dict_to_flax_params

    cfg = TrainConfig(arch=args.arch, neurons=args.neurons, prule=args.prule,
                      im_width=img_width, im_height=img_height, im_chan=img_chan)

    with matmul_precision(args.precision):
        model = build_model(cfg)
        print("Loading model %s" % args.model)
        params = state_dict_to_flax_params(load_pth(args.model), name_map_for(cfg))

        print("Loading data set")
        x_train, x_valid, y_train, y_valid = load_train_dataset(
            data_dir=args.data_dir, img_width=img_width, img_height=img_height,
            img_chan=img_chan, debug=args.debug,
        )
        print("Calculating best thershold value")
        xv = np.transpose(np.asarray(x_valid, np.float32), (0, 2, 3, 1))
        threshold_best, iou_best = score_model_best_iou(model, params, xv, y_valid, debug=args.debug)
        print("Best thershold:", threshold_best)
        print("Best IoU", iou_best)
        return threshold_best, iou_best


if __name__ == "__main__":
    main()
