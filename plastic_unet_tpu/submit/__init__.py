from plastic_unet_tpu.submit.inference import (  # noqa: F401
    inference,
    predict,
    predict_masks_tta,
    start_inference,
)
from plastic_unet_tpu.submit.export import (  # noqa: F401
    ExportedPredictor,
    export_predictor,
    load_predictor,
)
from plastic_unet_tpu.submit.server import MaskPredictor  # noqa: F401
