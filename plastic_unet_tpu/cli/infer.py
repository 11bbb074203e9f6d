"""Inference CLI — flag-compatible with the reference (src/infer.py:181-213).
Run: python3 -m plastic_unet_tpu.cli.infer ..."""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Infer test masks and write the RLE submission")
    p.add_argument("--model", "-m", default="MODEL.pth", help="file in which the model is stored")
    p.add_argument("-i", "--data", dest="data_dir", type=str, help="the directory with input test data")
    p.add_argument("--out", "-o", dest="out_dir", default="./out", help="directory for output images")
    p.add_argument("-g", "--gpu", action="store_true", dest="gpu", default=False,
                   help="accepted for reference compatibility; accelerator auto-selected")
    p.add_argument("--visualize", "-v", action="store_true", default=False,
                   help="visualize the images as they are processed")
    p.add_argument("--save", "-s", action="store_true", default=False, help="save the output masks")
    p.add_argument("--mask-threshold", "-t", dest="mask_threshold", type=float,
                   help="accepted for reference compatibility; like the reference, the threshold "
                        "actually used comes from the best-IoU validation search (infer.py:156-171). "
                        "Use --fixed-threshold to bypass the search.")
    p.add_argument("--partial", "-p", action="store_true", default=False, help="run on a partial dataset")
    p.add_argument("--partial-size", "-d", dest="partial_size", default=100, type=int, help="partial dataset size")
    # TPU-native extensions
    p.add_argument("--arch", default="unet_res", choices=["unet_res", "unet"])
    p.add_argument("--neurons", default=16, type=int)
    p.add_argument("--prule", default="hebb")
    p.add_argument("--tta", default="identity",
                   help="TTA views: preset tta2/tta4/tta8 (full dihedral group) or a comma list of "
                        "identity,hflip,vflip,rot90,rot180,rot270,transpose,anti_transpose. "
                        "tta4 is the quality-safe preset for anisotropic (seismic-like) data; the "
                        "axis-swapping views in tta8 can hurt there (QUALITY.md TTA study)")
    p.add_argument("--fixed-threshold", dest="fixed_threshold", type=float, default=None,
                   help="skip the validation threshold search and use this value")
    p.add_argument("--precision", default="perf")
    p.add_argument("--use-pallas", action="store_true", default=False)
    p.add_argument("--trunk-pad", type=int, default=0, metavar="SIZE",
                   help="MXU-aligned padded trunk (must match how the model was trained)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard inference batches over a data mesh of this many devices")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8 serving quantization (EXTENSION): calibrate activation ranges "
                        "on validation images, then run the conv trunk as int8 convs with "
                        "int32 accumulation (2x MXU rate on TPU v5e). The threshold search "
                        "runs on the quantized model, so the submission threshold adapts to "
                        "the quantized output distribution. See submit/quant.py")
    p.add_argument("--quant-calib", dest="quant_calib", type=int, default=256,
                   help="number of validation images used for int8 calibration")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t_img_width, t_img_height, t_img_chan = 101, 101, 1

    if args.data_dir is None:
        raise ValueError("The input data directory or dataset file not specified")

    from plastic_unet_tpu.data.dataset import load_test_dataset, load_train_dataset

    print("Getting and resizing test images... ")
    test_df = load_test_dataset(
        data_dir=args.data_dir,
        img_width=t_img_width,
        img_height=t_img_height,
        img_chan=t_img_chan,
        partial=args.partial,
        part_size=args.partial_size,
    )
    x_train, x_valid, y_train, y_valid = load_train_dataset(
        data_dir=args.data_dir, img_width=t_img_width, img_height=t_img_height, img_chan=t_img_chan, debug=True
    )
    if args.partial:
        x_valid = x_valid[: args.partial_size]
        y_valid = y_valid[: args.partial_size]
    print("Done!")

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.submit.inference import predict, start_inference
    from plastic_unet_tpu.train.driver import build_model, name_map_for
    from plastic_unet_tpu.utils.precision import matmul_precision
    from plastic_unet_tpu.utils.torch_interop import load_pth, state_dict_to_flax_params

    cfg = TrainConfig(
        arch=args.arch, neurons=args.neurons, prule=args.prule,
        im_width=t_img_width, im_height=t_img_height, im_chan=t_img_chan,
        use_pallas=args.use_pallas, trunk_pad=args.trunk_pad,
    )
    from plastic_unet_tpu.ops.augment import parse_tta

    tta = parse_tta(args.tta)
    mesh = None
    if args.devices > 1:
        from plastic_unet_tpu.parallel import make_mesh

        mesh = make_mesh(args.devices)

    with matmul_precision(args.precision):
        model = build_model(cfg)
        print("Loading model %s" % args.model)
        params = state_dict_to_flax_params(load_pth(args.model), name_map_for(cfg))

        if args.quant == "int8":
            from plastic_unet_tpu.submit.quant import quantize_for_serving

            import numpy as np

            xv_nhwc = np.transpose(np.asarray(x_valid, dtype=np.float32), (0, 2, 3, 1))
            n_cal = max(1, min(args.quant_calib, len(xv_nhwc)))
            print("Calibrating int8 serving on %d validation images" % n_cal)
            model, params = quantize_for_serving(model, params, xv_nhwc[:n_cal])

        if args.fixed_threshold is not None:
            run_params = {
                "out_dir": args.out_dir,
                "img_width": t_img_width,
                "img_height": t_img_height,
                "img_chan": t_img_chan,
                "mask_threshold": args.fixed_threshold,
                "subm_file": "submission.csv",
                "debug": True,
            }
            predict(model, params, test_df, run_params, visualize=args.visualize, save_masks=args.save, tta=tta, mesh=mesh)
        else:
            start_inference(
                model, params, test_df, x_valid, y_valid,
                out_dir=args.out_dir,
                img_width=t_img_width, img_height=t_img_height, img_chan=t_img_chan,
                visualize=args.visualize, save_masks=args.save, tta=tta, debug=True,
                mesh=mesh,
            )


if __name__ == "__main__":
    main()
