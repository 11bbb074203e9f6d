"""Training CLI — flag-compatible with the reference (src/train.py:316-358),
plus TPU-native extensions. Run: python3 -m plastic_unet_tpu.cli.train ..."""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the plastic U-Net (TPU-native)")
    # reference flags (names/defaults from train.py:316-358)
    p.add_argument("-e", "--epochs", dest="epochs", default=5, type=int, help="number of epochs")
    p.add_argument("-l", "--learning-rate", dest="lr", default=3e-5, type=float, help="learning rate")
    p.add_argument("-s", "--step-lr", dest="steplr", default=1e6, type=float, help="the learning rate annealing step")
    p.add_argument("-g", "--gpu", action="store_true", dest="gpu", default=False,
                   help="accepted for reference compatibility; the accelerator is auto-selected")
    p.add_argument("--prule", "-p", default="hebb", help="the plastic rule to use when training")
    p.add_argument("-c", "--load", dest="load", default=False, action="store_true", help="load file model")
    p.add_argument("--model", "-m", default="MODEL.pth", help="file in which the model is stored")
    p.add_argument("--max-train-time", dest="max_train_time", default=-1, type=int,
                   help="max training time limit in seconds [-1 = no limit]")
    p.add_argument("--save_every", dest="save_every", default=100, type=int, help="save results per # epochs")
    p.add_argument("--validate_every", dest="validate_every", default=50, type=int, help="validate per # epochs")
    p.add_argument("--rollout_every", dest="rollout_every", default=50000, type=int, help="rollout filenames per # epochs")
    p.add_argument("-d", "--data", dest="data_dir", type=str, help="the directory with input data")
    p.add_argument("-i", "--dataset", dest="dataset_file", type=str, help="path to an HDF5 dataset file")
    p.add_argument("-o", "--out", dest="out_dir", type=str, required=True, help="output directory")
    p.add_argument("-v", "--debug", action="store_true", dest="debug", default=False, help="show debug information")
    # TPU-native extensions
    p.add_argument("--arch", default="unet_res", choices=["unet_res", "unet"], help="model family")
    p.add_argument("--neurons", default=16, type=int, help="first-layer width (tuned script uses 8)")
    p.add_argument("--dropout", default=0.5, type=float, help="dropout ratio")
    p.add_argument("--alfa-type", default="free", choices=["free", "yoked"])
    p.add_argument("--lanes", default=1, type=int, help="parallel lifetime streams (1 = reference semantics)")
    p.add_argument("--devices", default=1, type=int, help="data-parallel devices (mesh over ICI)")
    p.add_argument("--trace-mode", default="per_device", choices=["per_device", "pmean"],
                   help="hebb-trace coherence across data-parallel devices")
    p.add_argument("--precision", default="perf", help="matmul precision policy: perf|parity|<jax literal>")
    p.add_argument("--use-pallas", action="store_true", default=False, help="fused Pallas plastic head")
    p.add_argument("--pallas-trunk", action="store_true", default=False,
                   help="fused Pallas residual tails (B=1 fp32 parity mode)")
    p.add_argument("--fast-dw", action="store_true", default=False,
                   help="im2col-matmul dw backward for 3x3 convs (B=1 win)")
    p.add_argument("--patch-conv", type=int, default=0, metavar="MAX_C",
                   help="im2col-FORWARD 3x3 convs for fp32 levels with Cin <= MAX_C "
                        "(32 = measured B=1 sweet spot; 0 = off)")
    p.add_argument("--remat-trunk", action="store_true", default=False,
                   help="jax.checkpoint the trunk blocks: recompute block "
                        "activations in the backward instead of storing them "
                        "(bit-identical grads; fits larger --lanes in HBM)")
    p.add_argument("--trunk-pad", type=int, default=0, metavar="SIZE",
                   help="pad inputs to SIZExSIZE (e.g. 128) so the trunk runs on "
                        "MXU-aligned power-of-two tracks, cropping back to nbf "
                        "before the head (geometry extension; 0 = off)")
    p.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"],
                   help="trunk compute dtype (head/loss stay fp32)")
    p.add_argument("--epochs-per-dispatch", type=int, default=1, metavar="K",
                   help="fold up to K epochs into one jitted scan (amortizes "
                        "dispatch overhead for small sweep-sized epochs; "
                        "1 = reference-exact dispatch cadence)")
    p.add_argument("--augment", action="store_true", default=False, help="random flip/rotate augmentation")
    p.add_argument("--shuffle", action="store_true", default=False,
                   help="per-epoch stream shuffle (shard-local under --devices)")
    p.add_argument("--no-plastic", action="store_true", default=False,
                   help="vanilla U-Net head (sigmoid on trunk logits, no plasticity)")
    p.add_argument("--rng-impl", default="threefry", choices=["threefry", "rbg", "unsafe_rbg"],
                   help="PRNG for dropout masks (rbg = TPU hardware RNG)")
    p.add_argument("--loss-space", default="logits", choices=["logits", "probs"])
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--synthetic", default=0, type=int, metavar="N",
                   help="train on N synthetic tiles instead of --data (smoke runs)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    print(args)

    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t_img_width, t_img_height, t_img_chan = 101, 101, 1

    if args.dataset_file:
        # Functional HDF5 dataset path (the reference parses -i/--dataset but
        # leaves it commented out in train_model.sh:20; here it works).
        import numpy as np
        from sklearn.model_selection import train_test_split

        from plastic_unet_tpu.data.dataset import cov_to_class
        from plastic_unet_tpu.data.hdf5_io import load_hdf5_data_set

        imgs, masks = load_hdf5_data_set(args.dataset_file)
        t_img_height, t_img_width = imgs.shape[1:3]
        x = imgs[..., :1].transpose(0, 3, 1, 2).astype(np.float32)
        y = masks.transpose(0, 3, 1, 2).astype(np.float32)
        coverage = y.mean(axis=(1, 2, 3))
        strata = [cov_to_class(c) for c in coverage]
        x_train, x_valid, y_train, y_valid = train_test_split(
            x, y, test_size=0.2, stratify=strata, random_state=42
        )
    elif args.synthetic:
        from plastic_unet_tpu.data.synthetic import synthetic_split

        n_val = max(args.synthetic // 5, 1)
        x_train, x_valid, y_train, y_valid = synthetic_split(args.synthetic - n_val, n_val, size=t_img_width)
    elif args.data_dir is not None:
        print("Getting train images and masks from data directory %s" % args.data_dir)
        sys.stdout.flush()
        from plastic_unet_tpu.data.dataset import load_train_dataset

        x_train, x_valid, y_train, y_valid = load_train_dataset(
            data_dir=args.data_dir,
            img_width=t_img_width,
            img_height=t_img_height,
            img_chan=t_img_chan,
            debug=args.debug,
        )
        print("Done!")
    else:
        raise ValueError("The input data directory or dataset file not specified")

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.train.driver import start_train

    cfg = TrainConfig(
        out_dir=args.out_dir,
        epochs=args.epochs,
        lr=args.lr,
        steplr=args.steplr,
        max_train_time=args.max_train_time,
        save_every=args.save_every,
        val_every=args.validate_every,
        rollout=args.rollout_every,
        prule=args.prule,
        debug=args.debug,
        load=bool(args.load),
        model_path=args.model,
        im_width=t_img_width,
        im_height=t_img_height,
        im_chan=t_img_chan,
        arch=args.arch,
        neurons=args.neurons,
        dropout_ratio=args.dropout,
        alfa_type=args.alfa_type,
        lanes=args.lanes,
        devices=args.devices,
        trace_mode=args.trace_mode,
        loss_space=args.loss_space,
        matmul_precision=args.precision,
        use_pallas=args.use_pallas,
        pallas_trunk=args.pallas_trunk,
        fast_dw=args.fast_dw,
        remat_trunk=args.remat_trunk,
        patch_conv=args.patch_conv,
        trunk_pad=args.trunk_pad,
        compute_dtype=args.compute_dtype,
        epochs_per_dispatch=args.epochs_per_dispatch,
        augment=args.augment,
        shuffle=args.shuffle,
        plastic=not args.no_plastic,
        rng_impl=args.rng_impl,
        seed=args.seed,
    )
    return start_train(x_train, x_valid, y_train, y_valid, cfg)


if __name__ == "__main__":
    main()
