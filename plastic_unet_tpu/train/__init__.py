from plastic_unet_tpu.train.driver import build_model, start_train, train  # noqa: F401
from plastic_unet_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_epoch_fn,
    make_train_step,
    reshape_stream,
)
from plastic_unet_tpu.train.optimizer import adam_step_lr, step_lr_schedule  # noqa: F401
