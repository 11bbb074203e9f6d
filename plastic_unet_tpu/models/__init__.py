"""Model families: residual plastic U-Net (flagship), classic plastic U-Net,
and the CoordConv U-Net (the reference's Keras-path solution)."""

from plastic_unet_tpu.models.coord_conv import CoordConvUNet  # noqa: F401
from plastic_unet_tpu.models.unet_classic import UNetP  # noqa: F401
from plastic_unet_tpu.models.unet_res import PlasticOutput, UNetPRes  # noqa: F401
