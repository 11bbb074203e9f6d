"""Core ops: plasticity rules, IoU metrics, RLE, losses, augmentation,
CoordConv channel injection, and the fused Pallas plastic-head kernel."""

from plastic_unet_tpu.ops.iou import (  # noqa: F401
    fast_iou_metric,
    get_iou_vector,
    iou_metric,
    iou_metric_batch,
    iou_metric_batch_jit,
    pixel_accuracy_jit,
    threshold_sweep_jit,
)
from plastic_unet_tpu.ops.losses import bce_logits, bce_probs  # noqa: F401
from plastic_unet_tpu.ops.plasticity import (  # noqa: F401
    PlasticParams,
    hebb_update,
    init_plastic_params,
    initial_zero_hebb,
    oja_update,
    plastic_head,
    plastic_head_logits,
)
from plastic_unet_tpu.ops.rle import encode, encode_batch, rle_decode, rle_encode  # noqa: F401
