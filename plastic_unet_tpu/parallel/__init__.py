"""Distribution layer: data-parallel lifetime training over a device mesh.

TP/PP/SP/EP/CP/ring-attention are deliberately NOT implemented: this model
family is a sub-10M-param CNN with no attention and no sequence axis, so the
only meaningful parallelism is over the sample stream (SURVEY.md §2.3). The
closest analogue to a sequence dimension — the lifetime hebb recurrence — is
inherently sequential and is handled by the trace-coherence modes in
parallel.dp.
"""

from plastic_unet_tpu.parallel.dp import dp_state_sharding, make_dp_epoch_fn, shard_stream  # noqa: F401
from plastic_unet_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    DCN_AXIS,
    lane_sharded,
    make_mesh,
    make_multislice_mesh,
    replicated,
)
from plastic_unet_tpu.parallel.multihost import process_local_slice, stage_global_stream  # noqa: F401
