"""Multi-host input pipeline helpers (SURVEY.md §7 stage 7).

On a multi-host TPU pod each process sees only its local devices; globally
sharded arrays must be assembled from per-process local shards. These
helpers split the sample stream by process so each host loads/stages only
its slice, then build the global array with
``jax.make_array_from_process_local_data``.

Single-process environments (like this build/test host) degenerate to the
single-host path — exercised by tests; the multi-process path follows the
standard JAX multi-host recipe and activates when ``jax.process_count()>1``
after ``jax.distributed.initialize()``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plastic_unet_tpu.parallel.mesh import DATA_AXIS


def process_local_slice(n_total: int) -> slice:
    """The [start, stop) slice of a length-n_total sample stream this process
    is responsible for loading (contiguous block partitioning)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = -(-n_total // pc)
    return slice(pi * per, min((pi + 1) * per, n_total))


def local_lane_block(X_local: np.ndarray, Y_local: np.ndarray, process_count: int, total_lanes: int):
    """Pure layout math of the multi-process branch: reshape this process's
    contiguous sample block into its (S, lanes_local, ...) lane block.

    Consistency contract (pinned by tests/test_parallel.py::
    test_multihost_lane_blocks_match_global): stacking the per-process
    blocks along the lane axis reproduces exactly what shard_stream computes
    on the full stream — lane l carries global samples [l*S, (l+1)*S)."""
    n_local = X_local.shape[0]
    s = (n_local * process_count) // total_lanes
    lanes_local = total_lanes // process_count
    Xl = X_local[: s * lanes_local].reshape(lanes_local, s, *X_local.shape[1:]).swapaxes(0, 1)
    Yl = Y_local[: s * lanes_local].reshape(lanes_local, s, *Y_local.shape[1:]).swapaxes(0, 1)
    return Xl, Yl


def stage_global_stream(X_local: np.ndarray, Y_local: np.ndarray, mesh: Mesh, lanes_per_device: int = 1):
    """Assemble the globally-sharded (S, D*L, ...) stream from per-process
    local chunks. With one process this equals parallel.shard_stream."""
    if jax.process_count() == 1:
        from plastic_unet_tpu.parallel.dp import shard_stream
        import jax.numpy as jnp

        return shard_stream(jnp.asarray(X_local), jnp.asarray(Y_local), mesh, lanes_per_device)

    d = mesh.devices.size
    total_lanes = d * lanes_per_device
    Xl, Yl = local_lane_block(X_local, Y_local, jax.process_count(), total_lanes)
    names = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(None, names))
    gx = jax.make_array_from_process_local_data(sharding, Xl)
    gy = jax.make_array_from_process_local_data(sharding, Yl)
    return gx, gy
