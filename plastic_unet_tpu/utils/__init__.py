from plastic_unet_tpu.utils.precision import matmul_precision  # noqa: F401
