"""Serving API — production-style batched mask prediction.

The reference has no serving story (its inference is a batch script,
infer.py); this wraps the batched zero-trace forward in a warm, reusable
predictor for deployment: load once (from a reference .pth, an Orbax
TrainState, or in-memory params), warm up the compiled graph, then serve
numpy batches at fixed chunk sizes (static shapes -> no recompiles).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


class MaskPredictor:
    """Warm batched predictor for plastic U-Net masks."""

    def __init__(
        self,
        model,
        params,
        *,
        chunk: int = 128,
        tta: Sequence[str] = ("identity",),
        threshold: float | None = None,
    ):
        self.model = model
        self.params = params
        self.chunk = chunk
        self.tta = tuple(tta)
        self.threshold = threshold

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_pth(cls, path: str, *, arch: str = "unet_res", nbf: int = 101, neurons: int = 16,
                 rule: str = "hebb", compute_dtype=None, **kw) -> "MaskPredictor":
        """Load a reference-format .pth checkpoint.

        compute_dtype: e.g. jnp.bfloat16 for MXU-native mixed-precision
        serving (params stay fp32; trunk matmuls run bf16 — the measured
        serving win in PERF.md). unet_res only."""
        from plastic_unet_tpu.models import UNetP, UNetPRes
        from plastic_unet_tpu.utils import torch_interop as ti

        if arch == "unet_res":
            model = UNetPRes(n_channels=1, n_classes=1, nbf=nbf, neurons=neurons, rule=rule,
                             compute_dtype=compute_dtype)
            params = ti.state_dict_to_flax_params(ti.load_pth(path), ti.unetp_res_name_map())
        else:
            if compute_dtype is not None and compute_dtype != jnp.float32:
                raise ValueError("compute_dtype is a unet_res-only knob (arch='unet' is fp32)")
            model = UNetP(n_channels=1, n_classes=1, nbf=nbf, rule=rule)
            params = ti.state_dict_to_flax_params(ti.load_pth(path), ti.unetp_name_map())
        return cls(model, params, **kw)

    # -- serving ------------------------------------------------------------

    def warmup(self) -> "MaskPredictor":
        """Compile the serving graph ahead of the first request."""
        h = w = self.model.nbf
        self.predict(np.zeros((1, h, w), np.float32))
        return self

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W) or (N, H, W, 1) float -> (N, nbf, nbf) sigmoid
        masks (or binary masks if a threshold is configured)."""
        from plastic_unet_tpu.submit.inference import predict_masks_tta, threshold_as_f32

        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        preds = np.asarray(
            predict_masks_tta(self.model, self.params, jnp.asarray(x), transforms=self.tta, chunk=self.chunk)
        )
        if self.threshold is not None:
            # f64-exact compare (matches submit.inference.predict and exported
            # artifacts — a p == f32(threshold) pixel classifies identically).
            return preds > threshold_as_f32(float(self.threshold))
        return preds

    def predict_rle(self, images: np.ndarray, threshold: float | None = None) -> list[str]:
        """Predict and RLE-encode (submission-format strings)."""
        from plastic_unet_tpu.ops.rle import encode_batch
        from plastic_unet_tpu.submit.inference import threshold_as_f32

        thr = self.threshold if threshold is None else threshold
        if thr is None:
            raise ValueError("predict_rle requires a threshold")
        preds = self.predict(images)
        masks = preds if preds.dtype == bool else preds > threshold_as_f32(float(thr))
        return encode_batch(masks.astype(np.uint8))
