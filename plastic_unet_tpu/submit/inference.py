"""Inference + Kaggle submission pipeline.

Reference semantics (src/infer.py):
  * inference (:28-48): eval mode, zero hebb, single forward -> numpy mask.
  * predict (:50-108): loop the test set, optional per-image visualization
    and PNG mask dump to out/masks/<id>.png, then
    {id: encode(round(pred > threshold))} -> submission.csv (id, rle_mask).
  * start_inference (:110-179): load weights, best-threshold search on
    validation (via eval.score_model_best_iou), then predict.

TPU-native design: the per-image python loop becomes chunked batched
zero-trace forwards (eval.predict_masks); optional TTA (identity+flips,
merged by mean — a capability extension, see ops.augment) fuses into the
same jitted forward; RLE encoding runs through the native C++ batch encoder
when built.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.eval.evaluate import predict_masks, score_model_best_iou
from plastic_unet_tpu.ops.augment import TTA_TRANSFORMS, tta_merge
from plastic_unet_tpu.ops.rle import encode_batch


def inference(model, params, img_data: np.ndarray) -> np.ndarray:
    """Predict the mask for one image (CHW or HWC or HW input), zero trace."""
    img = np.asarray(img_data, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    elif img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.transpose(img, (1, 2, 0))  # CHW -> HWC
    pred = predict_masks(model, params, jnp.asarray(img)[None], chunk=1)
    return np.asarray(pred[0])


def predict_masks_tta(
    model,
    params,
    X,
    *,
    transforms: Sequence[str] = ("identity",),
    chunk: int = 128,
    mesh=None,
    batch_views: bool = False,
):
    """Chunked zero-trace prediction with TTA merge. X: (N, H, W, C) NHWC.
    Returns (N, nbf, nbf) mean-of-views sigmoid masks. mesh: optional data
    mesh — shards each chunk's batch axis across devices (see
    eval.predict_masks).

    batch_views=True folds the T views into the batch axis of ONE chunked
    pass (T*N samples) instead of T sequential full passes. Per-sample math
    is batch-position-independent in eval mode (no dropout, no cross-batch
    reductions), so the result is exactly equal to the sequential path
    (tests/test_augment.py::test_batched_views_tta_exact)."""
    if tuple(transforms) == ("identity",):
        return predict_masks(model, params, X, chunk=chunk, mesh=mesh)
    X = jnp.asarray(X)
    if batch_views:
        from plastic_unet_tpu.ops.augment import tta_batched_apply

        return tta_batched_apply(
            lambda allv: predict_masks(model, params, allv, chunk=chunk, mesh=mesh), X, transforms
        )
    views = []
    for t in transforms:
        fwd, _ = TTA_TRANSFORMS[t]
        views.append(predict_masks(model, params, fwd(X, True), chunk=chunk, mesh=mesh))
    stacked = jnp.stack(views, axis=0)  # (T, N, nbf, nbf)
    return tta_merge(stacked, transforms, channels_last=False)


def threshold_as_f32(t: float) -> np.float32:
    """The f32 threshold whose compare `p > t32` equals the host float64
    compare `p > t` for EVERY f32 prediction p: the largest f32 <= t (no f32
    lies in (t32, t], so the classified sets are identical). Thresholds from
    score_model_best_iou are already exact f32 (the grid is f32) and pass
    through unchanged; --fixed-threshold can be any float64 (e.g. 0.3, whose
    round-nearest f32 is ABOVE it and would misclassify p == f32(0.3)).

    NEP-50 caveat (documented deviation, PARITY.md): under numpy >= 2.0 the
    reference's own `pred > mask_threshold` (infer.py:99) no longer promotes
    to float64 — NEP 50 converts the python-float scalar to f32 ROUND-NEAREST
    before comparing. For a non-f32-exact fixed threshold like 0.3 (whose
    nearest f32 lies ABOVE it) a prediction exactly equal to f32(0.3) is True
    here (f64 semantics) but False under a numpy-2.x reference. We keep the
    f64-exact semantics deliberately: they are numpy-version-independent and
    match the pre-NEP-50 reference; searched thresholds are exact f32 either
    way, so the full-pipeline byte-parity test is unaffected."""
    t32 = np.float32(t)
    if float(t32) > float(t):
        t32 = np.nextafter(t32, np.float32(-np.inf))
    return t32


def predict(
    model,
    params,
    test_df,
    run_params: dict,
    visualize: bool = False,
    save_masks: bool = False,
    tta: Sequence[str] = ("identity",),
    chunk: int = 128,
    mesh=None,
):
    """Predict all test masks and write the RLE submission CSV.

    test_df: DataFrame indexed by tile id with an 'images' column (the
    reference contract, infer.py:64-68). run_params carries img geometry,
    mask_threshold, out_dir, subm_file.
    """
    import pandas as pd

    print("Start prediction with the number of test image samples:", len(test_df.index))

    X_test = np.array(test_df.images.tolist(), dtype=np.float32).reshape(
        -1, run_params["img_height"], run_params["img_width"], run_params["img_chan"]
    )
    mask_threshold = run_params["mask_threshold"]

    # Binarize ON DEVICE and fetch uint8: every consumer below (viz, PNG
    # dump, RLE) uses only `pred > threshold`, and the uint8 fetch moves 4x
    # less data through the (bandwidth- and roundtrip-limited) device link
    # than the fp32 probabilities. The full-pipeline byte-parity test runs
    # through this path.
    t32 = threshold_as_f32(mask_threshold)
    preds_dev = predict_masks_tta(model, params, X_test, transforms=tta, chunk=chunk, mesh=mesh)
    masks = np.asarray((preds_dev > jnp.float32(t32)).astype(jnp.uint8))

    if visualize:
        from plastic_unet_tpu.viz.plots import plot_image_mask

        for i in range(len(masks)):
            image = X_test[i].squeeze()
            plot_image_mask(np.dstack((image, image, image)), masks[i])

    if save_masks:
        from plastic_unet_tpu.data.images import save_mask_png

        mask_dir = os.path.join(run_params["out_dir"], "masks")
        os.makedirs(mask_dir, exist_ok=True)
        for i, idx in enumerate(test_df.index):
            save_mask_png(os.path.join(mask_dir, f"{idx}.png"), masks[i].astype(bool))

    print(masks[0].shape)
    print("Inference complete")

    # RLE-encode binarized masks (round(pred > thr) as in infer.py:99)
    rles = encode_batch(masks)
    pred_dict = {fn: rles[i] for i, fn in enumerate(test_df.index)}

    subm_file = os.path.join(run_params["out_dir"], run_params["subm_file"])
    sub = pd.DataFrame.from_dict(pred_dict, orient="index")
    sub.index.names = ["id"]
    sub.columns = ["rle_mask"]
    sub.to_csv(subm_file)
    print("Results encoded to:", subm_file)
    return subm_file


def start_inference(
    model,
    params,
    test_df,
    X_valid,
    y_valid,
    out_dir: str,
    img_width: int,
    img_height: int,
    img_chan: int,
    subm_file: str = "submission.csv",
    visualize: bool = False,
    save_masks: bool = False,
    tta: Sequence[str] = ("identity",),
    debug: bool = False,
    mesh=None,
):
    """Best-threshold search on validation, then full test prediction
    (reference start_inference, infer.py:110-179). X_valid arrives NCHW
    (the reference data contract) and is transposed to NHWC here."""
    xv = np.transpose(np.asarray(X_valid, dtype=np.float32), (0, 2, 3, 1))
    print("Score model for best IoU")
    threshold_best, iou_best = score_model_best_iou(model, params, xv, np.asarray(y_valid), debug=debug)
    print("Best threshold: %f, best IoU: %f" % (threshold_best, iou_best))

    run_params = {
        "out_dir": out_dir,
        "img_width": img_width,
        "img_height": img_height,
        "img_chan": img_chan,
        "mask_threshold": threshold_best,
        "subm_file": subm_file,
        "debug": debug,
    }
    os.makedirs(out_dir, exist_ok=True)
    return predict(model, params, test_df, run_params, visualize=visualize, save_masks=save_masks, tta=tta, mesh=mesh)
