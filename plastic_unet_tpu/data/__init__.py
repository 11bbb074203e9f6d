from plastic_unet_tpu.data.dataset import cov_to_class, load_test_dataset, load_train_dataset  # noqa: F401
from plastic_unet_tpu.data.hdf5_io import create_hdf5_data_set, load_hdf5_data_set  # noqa: F401
from plastic_unet_tpu.data.images import chw_to_hwc, hwc_to_chw, load_image, save_mask_png  # noqa: F401
from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles  # noqa: F401
