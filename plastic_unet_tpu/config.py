"""Run configuration — a single dataclass replacing the reference's mutable
params dict (src/train.py:267-282) and optparse flag sets, preserving every
reference flag name/semantic (SURVEY.md §5 'Config / flag system') and
adding the TPU-native knobs as explicit, documented options.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence


@dataclasses.dataclass
class TrainConfig:
    # --- reference hyperparameters (train.py:213-231 defaults) ---
    out_dir: str = "./out"
    epochs: int = 5
    lr: float = 3e-5
    val_ratio: float = 0.05  # stored-but-unused in the reference too (SURVEY §2.1)
    val_every: int = 50
    save_every: int = 100
    gamma: float = 0.666
    steplr: float = 1e6
    rollout: int = 50000
    prule: str = "hebb"
    max_train_time: int = -1  # seconds; predictive early stop (train.py:118-122)
    debug: bool = False
    load: bool = False
    model_path: str = "MODEL.pth"

    # --- geometry (train.py:370-372) ---
    im_width: int = 101
    im_height: int = 101
    im_chan: int = 1

    # --- model family / architecture ---
    arch: str = "unet_res"  # 'unet_res' | 'unet' (the CoordConv Keras-path
    # model has its own trainer with Keras fit semantics — train.coord_trainer
    # / cli.coord_conv — and is not selected through this driver config)
    neurons: int = 16
    dropout_ratio: float = 0.5
    alfa_type: str = "free"
    batch_norm: bool = False
    bilinear_upsample: bool = False

    # --- TPU-native knobs (capability extensions; defaults = reference parity) ---
    lanes: int = 1  # parallel lifetime streams per device (1 == reference)
    devices: int = 1  # data-parallel devices (mesh over ICI); 1 = single chip
    loss_space: str = "logits"  # 'logits' (stable) | 'probs' (torch-exact clamp)
    matmul_precision: str = "perf"  # 'parity' for bit-faithful fp32
    use_pallas: bool = False  # fused Pallas plastic head
    pallas_trunk: bool = False  # fused Pallas residual tails (B=1 fp32; PERF.md)
    fast_dw: bool = False  # hand-written im2col dw backward for 3x3 convs
    remat_trunk: bool = False  # jax.checkpoint every trunk block: backward
    # recomputes block-internal activations instead of reading them from HBM
    # (HBM <-> FLOPs trade; bit-identical grads, so parity-safe — use to fit
    # larger lane counts / nbf in device memory)
    patch_conv: int = 0  # im2col-FORWARD 3x3 convs for fp32 levels with
    # Cin <= this (0 = off; 32 = the measured B=1 sweet spot, PERF.md).
    # Same math as the XLA conv, matmul-ordered fp32 accumulation.
    trunk_pad: int = 0  # MXU-aligned padded trunk: pad inputs spatially to
    # this size (128 = the aligned target for 101-px tiles) so every level
    # runs on power-of-two tracks, cropping back to nbf before the head.
    # Geometry/throughput EXTENSION (changes receptive fields + FLOPs, not
    # parity); quality validated by the showdown protocol. 0 = off.
    plastic: bool = True  # False = vanilla U-Net head (sigmoid on trunk logits)
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-native mixed precision (trunk only; head/loss stay fp32)
    augment: bool = False  # random flip/rotate (new capability)
    shuffle: bool = False  # per-epoch stream shuffle (the reference iterates
    # the dataset in a fixed order every epoch, train.py:91 — default off)
    tta: Sequence[str] = ("identity",)  # inference-time TTA views
    seed: int = 42
    rng_impl: str = "threefry"  # 'rbg' = TPU hardware RNG for dropout masks
    # (fewer ops per step in the launch-bound B=1 mode; same mask
    # distribution, different stream — parity tests keep threefry)
    epochs_per_dispatch: int = 1  # fold up to K epochs into one jitted scan
    # (amortizes ~50 ms/dispatch for small sweep-sized epochs; chunks never
    # cross a validation/save/rollout boundary, and 1 = reference-exact
    # dispatch cadence. >1 coarsens the wall-clock stop check and NaN
    # detection to chunk granularity. Works on both the single-device and
    # the data-parallel path (devices>1 routes through
    # parallel.dp.make_dp_multi_epoch_fn — bit-identical to per-epoch DP
    # dispatches, tests/test_multi_epoch.py).
    # (REMOVED round 5: cfg.pipelined, the delayed-gradient stale-by-one
    # epoch — measured 0.68-0.69x in every regime, B=1 and lane scale; see
    # PERF.md "Measured negative results". The B=1 dependency chain is the
    # floor; the slack probe showed no idle execution to hide a forward in.)
    quirk_epoch_loss: bool = True  # reproduce train.py:115 (all_losses[-N] scalar)
    trace_mode: str = "per_device"  # 'per_device' (faithful) | 'pmean' (throughput)
    resume_orbax: str = ""  # path to an orbax TrainState for exact resume
    # (params + Adam moments + trace + step; richer than .pth resume)

    @property
    def stop_time(self) -> float:
        return time.time() + self.max_train_time if self.max_train_time > 0 else -1.0

    def as_run_params(self, stop_time: float | None = None) -> dict:
        """The reference's pickled params-dict shape (train.py:267-282)."""
        return {
            "out_dir": self.out_dir,
            "device": "tpu",
            "epochs": self.epochs,
            "stop_time": self.stop_time if stop_time is None else stop_time,
            "lr": self.lr,
            "val_ratio": self.val_ratio,
            "val_every": self.val_every,
            "save_every": self.save_every,
            "rollout": self.rollout,
            "gamma": self.gamma,
            "steplr": self.steplr,
            "prule": self.prule,
            "im_width": self.im_width,
            "im_height": self.im_height,
            "im_chan": self.im_chan,
            "debug": self.debug,
        }
