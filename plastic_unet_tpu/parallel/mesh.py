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
DCN_AXIS = "dcn"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_multislice_mesh(n_slices: int, devices_per_slice: int, devices=None) -> Mesh:
    """2-D ('dcn', 'data') mesh for multi-slice pods: the outer axis crosses
    slice boundaries (DCN), the inner axis stays within a slice (ICI).
    Gradient all-reduces over P((DCN_AXIS, DATA_AXIS)) then ride ICI first
    and cross DCN once per slice — the standard multi-slice DP layout."""
    if devices is None:
        devices = jax.devices()
    need = n_slices * devices_per_slice
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_slices, devices_per_slice)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def lane_sharded(mesh: Mesh, lane_axis: int = 0) -> NamedSharding:
    """Shard the lane (stream) axis across the data axis of the mesh."""
    spec = [None] * (lane_axis + 1)
    spec[lane_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
