from plastic_unet_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: F401
from plastic_unet_tpu.utils.precision import matmul_precision  # noqa: F401
