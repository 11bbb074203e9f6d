from plastic_unet_tpu.submit.inference import (  # noqa: F401
    inference,
    predict,
    predict_masks_tta,
    start_inference,
)
