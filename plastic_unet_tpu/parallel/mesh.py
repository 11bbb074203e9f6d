"""Device mesh construction for data-parallel training over ICI.

The reference has no distributed code (SURVEY.md §2.3); this layer is the
TPU-native equivalent demanded by BASELINE.json's north star: batch sharded
on a 'data' mesh axis, parameters replicated, gradients combined with psum
(XLA lowers to an ICI all-reduce; add a 'dcn' outer axis for multi-slice).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def lane_sharded(mesh: Mesh, lane_axis: int = 0) -> NamedSharding:
    """Shard the lane (stream) axis across the data axis of the mesh."""
    spec = [None] * (lane_axis + 1)
    spec[lane_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
