"""Portable deployment artifacts via `jax.export` (serialized StableHLO).

The reference has no deployment story — its inference is a batch script that
needs the full source tree plus a torch install (src/infer.py:110-179). The
TPU-native serving equivalent of a TorchScript/ONNX export is `jax.export`:
trace the zero-trace serving forward ONCE, serialize the lowered StableHLO,
and ship a self-contained artifact that any machine with jax can execute —
no model code, no torch, no checkpoint plumbing at the deployment site.

Design:
  * The exported function is the production serving step — the chunked
    eval-mode forward of eval.evaluate._forward_chunk, optionally with the
    dihedral TTA views folded into the graph (batched-views form, exactly
    equal to sequential TTA — tests/test_augment.py) and an optional baked
    binarization threshold (f64-exact via threshold_as_f32).
  * Params are baked into the graph as constants: one artifact, zero
    side-files, sub-10M params (SURVEY.md §2.2) so module size is trivial.
  * Static chunk shape (default 128, the measured serving sweet spot,
    PERF.md) — the loader pads partial chunks, mirroring predict_masks.
  * Multi-platform lowering (default cpu+tpu): the same bytes run on a CPU
    box or a TPU host; `jax.export` verifies platform compatibility at call
    time.
  * Optional DP-sharded export (data_devices=N): the chunk's batch axis is
    partitioned over an N-device ('data',) mesh — multi-chip serving from
    one bundle (the loader rebuilds the mesh and device_puts each chunk;
    jax.export enforces the device count). Zero-trace inference needs no
    collectives, so the sharded graph is pure batch partitioning — equal to
    the single-device artifact to 1 ULP (the partitioned per-device batch
    shape changes XLA's fusion/tiling; measured 6e-8 on <0.1% of pixels,
    tests/test_export.py::test_sharded_artifact_exact).
  * Numerics: the plain forward reloads bit-exact vs the live serving path
    (tests/test_export.py::test_roundtrip_exact); the fused TTA graph can
    differ by 1 ULP after recompilation from serialized StableHLO (XLA may
    fuse the view-concat graph differently than the live trace — measured
    6e-8 max under parity precision).

Artifact layout (a directory):
  forward.jaxexp   serialized `jax.export.Exported` bytes
  meta.json        shapes/dtype/views/threshold/platform manifest

The loader (`load_predictor`) needs only jax + numpy + this file — it never
imports the model zoo, flax, or torch.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

_ARTIFACT_BIN = "forward.jaxexp"
_ARTIFACT_META = "meta.json"
_FORMAT_VERSION = 1


def _data_sharding(n_dev: int, site: str):
    """NamedSharding partitioning the batch axis over the first n_dev local
    devices as a ('data',) mesh — shared by export (graph partitioning) and
    the loader (chunk placement) so both sides agree on the mesh layout."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = jax.devices()
    if len(devs) < n_dev:
        raise ValueError(
            f"{site}: {n_dev} devices required but only {len(devs)} local devices "
            "are visible (use virtual CPU devices: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    mesh = Mesh(np.array(devs[:n_dev]), ("data",))
    return NamedSharding(mesh, PartitionSpec("data"))


def _serving_fn(model, params, transforms: Sequence[str], threshold):
    """Build the jittable serving step for export.

    (chunk, H, W, C) f32 -> (chunk, nbf, nbf) f32 sigmoid masks, or uint8
    binary masks when a threshold is baked. TTA views are folded into the
    batch axis of one forward (batch-position-independent in eval mode, so
    exactly equal to per-view passes)."""
    from plastic_unet_tpu.eval.evaluate import _as_variables
    from plastic_unet_tpu.ops.augment import TTA_TRANSFORMS, tta_batched_apply
    from plastic_unet_tpu.submit.inference import threshold_as_f32

    variables = _as_variables(params)  # accepts int8-serving {'params','quant'} bundles
    transforms = tuple(transforms)
    unknown = [t for t in transforms if t not in TTA_TRANSFORMS]
    if unknown:
        raise ValueError(f"unknown TTA view(s) {unknown}; valid: {sorted(TTA_TRANSFORMS)}")
    t32 = None if threshold is None else jnp.float32(threshold_as_f32(float(threshold)))

    def fn(x):
        if transforms == ("identity",):
            hebb = model.initial_zero_hebb(x.shape[0], dtype=x.dtype)
            pred = model.apply(variables, x, hebb, train=False).activout
        else:

            def fwd(allv):
                hebb = model.initial_zero_hebb(allv.shape[0], dtype=allv.dtype)
                return model.apply(variables, allv, hebb, train=False).activout

            pred = tta_batched_apply(fwd, x, transforms)
        if t32 is not None:
            return (pred > t32).astype(jnp.uint8)
        return pred

    return fn


def export_predictor(
    model,
    params,
    path: str,
    *,
    chunk: int = 128,
    tta: Sequence[str] = ("identity",),
    threshold: float | None = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    data_devices: int = 1,
) -> str:
    """Serialize the serving forward to a self-contained artifact directory.

    model/params: a plastic U-Net (models.UNetPRes / UNetP) and its flax
    params; the params are baked into the exported module as constants.
    chunk: static serving batch size (loader pads partial chunks).
    tta: dihedral view names (ops.augment.TTA_TRANSFORMS) folded in-graph.
    threshold: if set, the artifact emits uint8 binary masks using the
    f64-exact f32 compare (submit.inference.threshold_as_f32).
    platforms: jax.export lowering platforms; the artifact runs on any of
    them. Returns `path`.
    data_devices: export the DP-sharded serving graph for an N-device
    ('data',) mesh — each chunk's batch axis is partitioned across devices,
    params replicated (the TPU-native analogue of multi-GPU serving; the
    zero-trace forward needs no collectives). Requires N local devices at
    export time (virtual CPU devices work: the StableHLO is topology-
    portable across the lowering platforms) and exactly N at the deployment
    site — jax.export enforces the device count at call time.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    if data_devices < 1:
        raise ValueError(f"data_devices must be >= 1, got {data_devices}")
    fn = _serving_fn(model, params, tta, threshold)
    h = w = model.nbf
    spec = jax.ShapeDtypeStruct((chunk, h, w, model.n_channels), jnp.float32)
    if data_devices > 1:
        if chunk % data_devices:
            raise ValueError(
                f"chunk ({chunk}) must be divisible by data_devices ({data_devices})"
            )
        shard = _data_sharding(data_devices, f"export with data_devices={data_devices}")
        jit_fn = jax.jit(fn, in_shardings=shard, out_shardings=shard)
    else:
        jit_fn = jax.jit(fn)
    exported = jexport.export(jit_fn, platforms=tuple(platforms))(spec)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT_BIN), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "format_version": _FORMAT_VERSION,
        "chunk": int(chunk),
        "height": int(h),
        "width": int(w),
        "channels": int(model.n_channels),
        "tta": list(tta),
        "threshold": None if threshold is None else float(threshold),
        "output_dtype": "uint8" if threshold is not None else "float32",
        "platforms": list(platforms),
        "data_devices": int(data_devices),
        "model": type(model).__name__,
        # mixed-precision serving graphs (bf16 trunk matmuls) are baked into
        # the StableHLO; recorded so the deployment site knows what it runs
        "compute_dtype": (jnp.dtype(model.compute_dtype).name
                          if getattr(model, "compute_dtype", None) is not None
                          else "float32"),
        "rule": getattr(model, "rule", None),
        "neurons": getattr(model, "neurons", None),
        "nbf": int(model.nbf),
    }
    with open(os.path.join(path, _ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class ExportedPredictor:
    """A deserialized serving artifact: chunked batched mask prediction.

    Mirrors serving semantics (eval.evaluate.predict_masks): pads the batch
    to a multiple of the exported chunk, runs the deserialized StableHLO
    module per chunk, slices the padding off. Needs no model code."""

    def __init__(self, exported: "jexport.Exported", meta: dict):
        self.exported = exported
        self.meta = meta
        self.chunk = int(meta["chunk"])
        self.threshold = meta.get("threshold")
        self._call = jax.jit(exported.call)
        self._sharding = None
        n_dev = int(meta.get("data_devices", 1))
        if n_dev > 1:
            self._sharding = _data_sharding(n_dev, f"artifact exported for {n_dev} devices")

    def warmup(self) -> "ExportedPredictor":
        """Compile the deserialized module ahead of the first request."""
        self.predict(
            np.zeros(
                (1, self.meta["height"], self.meta["width"], self.meta["channels"]), np.float32
            )
        )
        return self

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W) or (N, H, W, C) float -> (N, nbf, nbf) sigmoid
        masks (float32), or binary masks (uint8) for thresholded artifacts."""
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        expect = (self.meta["height"], self.meta["width"], self.meta["channels"])
        if x.ndim != 4 or x.shape[1:] != expect:
            raise ValueError(f"expected (N, {expect[0]}, {expect[1]}, {expect[2]}) images, got {x.shape}")
        n = x.shape[0]
        pad = (-n) % self.chunk
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.float32)], axis=0)
        # Outputs are pulled to host INSIDE the loop (device residency really
        # is O(chunk), not O(total batch) — a large N on a small deployment
        # device must not OOM on accumulated results). One chunk is kept in
        # flight: chunk i+1 is dispatched before chunk i's readback, so the
        # host transfer overlaps the next chunk's compute.
        outs = []
        pending = None
        for i in range(0, x.shape[0], self.chunk):
            c = x[i : i + self.chunk]
            if self._sharding is not None:
                # sharded artifacts must be called with batch-partitioned
                # inputs (jax.export enforces the exported device count)
                c = jax.device_put(c, self._sharding)
            nxt = self._call(c)
            if pending is not None:
                outs.append(np.asarray(pending))
            pending = nxt
        if pending is not None:
            outs.append(np.asarray(pending))
        return np.concatenate(outs, axis=0)[:n]

    def predict_rle(self, images: np.ndarray, threshold: float | None = None) -> list:
        """Predict and RLE-encode (submission-format strings). Thresholded
        artifacts already emit binary masks; probability artifacts need a
        threshold here (or in meta)."""
        from plastic_unet_tpu.ops.rle import encode_batch
        from plastic_unet_tpu.submit.inference import threshold_as_f32

        preds = self.predict(images)
        if preds.dtype == np.uint8:
            return encode_batch(preds)
        thr = self.threshold if threshold is None else threshold
        if thr is None:
            raise ValueError("predict_rle requires a threshold")
        return encode_batch((preds > threshold_as_f32(float(thr))).astype(np.uint8))


def load_predictor(path: str) -> ExportedPredictor:
    """Load an `export_predictor` artifact directory. Requires only jax — no
    flax/torch/model code; platform compatibility (cpu/tpu per the manifest)
    is enforced by jax.export at call time."""
    with open(os.path.join(path, _ARTIFACT_META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported artifact format_version {meta.get('format_version')!r}")
    with open(os.path.join(path, _ARTIFACT_BIN), "rb") as f:
        exported = jexport.deserialize(f.read())
    return ExportedPredictor(exported, meta)
