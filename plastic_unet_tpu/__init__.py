"""plastic_unet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of yaricom/Plastic-UNet.

This is a ground-up redesign, not a port: models are Flax modules compiled by
XLA, the differentiable-plasticity head is a fused Pallas TPU kernel carried
through a `lax.scan` lifetime loop, evaluation/inference are batched (vmapped)
device-side pipelines, and data parallelism runs over a `jax.sharding.Mesh`
with ICI collectives.

Capability map vs the reference (file:line cites into /root/reference):
  - models.unet_res.UNetPRes   <-> src/unet/unet_p_res.py:9  (UNetpRes)
  - models.unet_classic.UNetP  <-> src/unet/unet_p.py:8      (UNetp)
  - models.coord_conv          <-> src/coord_conv_script.py:61-200
  - ops.plasticity             <-> src/unet/unet_p_res.py:115-140
  - ops.iou                    <-> src/utils/iou_metric.py
  - ops.rle                    <-> src/utils/rle_encode.py
  - train.loop                 <-> src/train.py:29-211
  - eval.evaluate              <-> src/eval.py:20-103
  - submit.inference           <-> src/infer.py
  - data.dataset               <-> src/utils/data_set.py
  - viz                        <-> src/utils/{data,keras_history}_visualization.py
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("PLASTIC_UNET_PLATFORM"):
    # Reliable platform forcing for CLI runs. The JAX_PLATFORMS env var is
    # NOT sufficient in environments whose sitecustomize pre-imports jax
    # with its own platform plugin (the plugin still initializes and can
    # claim an accelerator); jax.config.update works as long as no backend
    # has been initialized yet, which holds at package-import time.
    try:
        import jax as _jax

        # jax.config.update silently no-ops (no exception) once a backend is
        # initialized — exactly the hazard this knob guards against. Detect
        # that case explicitly (same already-initialized probe as
        # utils.compilation_cache._backend_is_cpu) and route it through the
        # loud warning below instead of pretending the force took effect.
        from jax._src import xla_bridge as _xb

        _want = _os.environ["PLASTIC_UNET_PLATFORM"].split(",")[0].strip().lower()
        if _xb._backends and _jax.default_backend() != _want:
            raise RuntimeError(
                f"a {_jax.default_backend()!r} backend was already initialized "
                "before `import plastic_unet_tpu`; jax_platforms can no longer "
                "be changed in this process"
            )
        _jax.config.update("jax_platforms", _os.environ["PLASTIC_UNET_PLATFORM"])
    except Exception as _e:
        # Do NOT swallow silently: a failed force leaves the process on the
        # default backend (possibly a single-client TPU relay) — the exact
        # hazard this knob exists to prevent. Warn loudly so the caller can
        # bail before claiming an accelerator it did not want.
        import sys as _sys

        print(
            "plastic_unet_tpu: WARNING: PLASTIC_UNET_PLATFORM="
            f"{_os.environ['PLASTIC_UNET_PLATFORM']!r} could not be applied "
            f"({type(_e).__name__}: {_e}); the process will use the default "
            "JAX backend. Set the platform before any jax backend use "
            "(import plastic_unet_tpu first).",
            file=_sys.stderr,
            flush=True,
        )

from plastic_unet_tpu import ops  # noqa: F401
