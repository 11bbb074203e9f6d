"""Deployment-artifact export CLI.

Serializes a trained checkpoint's serving forward (zero-trace eval-mode,
optional in-graph TTA, optional baked threshold) to a portable StableHLO
artifact directory via jax.export (submit/export.py). The artifact serves
on any cpu/tpu jax host with no model code or torch install — the
deployment-side counterpart of the reference's source-tree-plus-torch
inference script (src/infer.py:110-179). Run:
  python3 -m plastic_unet_tpu.cli.export_model \
      --model out/train_net.pth --out out/artifact --tta tta8 --threshold 0.5
Serve it:
  plastic-unet-serve --artifact out/artifact
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Export a serving artifact (serialized StableHLO)")
    p.add_argument("--model", "-m", required=True, help=".pth checkpoint (reference format)")
    p.add_argument("--out", "-o", required=True, help="output artifact directory")
    p.add_argument("--arch", default="unet_res", choices=("unet_res", "unet"))
    p.add_argument("--nbf", default=101, type=int)
    p.add_argument("--neurons", default=16, type=int)
    p.add_argument("--prule", default="hebb", choices=("hebb", "oja"))
    p.add_argument("--tta", default="identity",
                   help="preset tta2/tta4/tta8 or comma list of dihedral views")
    p.add_argument("--threshold", type=float, default=None,
                   help="bake a binarization threshold (artifact emits uint8 masks)")
    # 128 is the measured serving sweet spot (PERF.md serving section).
    p.add_argument("--chunk", default=128, type=int, help="static serving batch size")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of jax.export lowering platforms")
    p.add_argument("--compute-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bake a mixed-precision serving graph (bf16 trunk "
                        "matmuls on the MXU — the measured serving win in "
                        "PERF.md; unet_res only)")
    p.add_argument("--data-devices", default=1, type=int, metavar="N",
                   help="export the DP-sharded serving graph for an N-device "
                        "('data',) mesh (requires N local devices at export "
                        "time and exactly N at the serving site; chunk must "
                        "divide by N)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from plastic_unet_tpu.ops.augment import parse_tta
    from plastic_unet_tpu.submit.export import export_predictor
    from plastic_unet_tpu.submit.server import MaskPredictor

    import jax.numpy as jnp

    pred = MaskPredictor.from_pth(
        args.model, arch=args.arch, nbf=args.nbf, neurons=args.neurons, rule=args.prule,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else None,
    )
    path = export_predictor(
        pred.model,
        pred.params,
        args.out,
        chunk=args.chunk,
        tta=parse_tta(args.tta),
        threshold=args.threshold,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        data_devices=args.data_devices,
    )
    print("Exported serving artifact to:", path)


if __name__ == "__main__":
    main()
