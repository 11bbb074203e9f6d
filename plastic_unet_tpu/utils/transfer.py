"""Device->host transfer helpers.

Through the axon TPU relay every device->host fetch pays a ~25-30 ms
roundtrip (PERF.md timing methodology), so fetching a parameter tree leaf by
leaf — what naive np.asarray-per-leaf checkpointing does — costs
O(num_leaves) roundtrips (~1.2 s for the 43-leaf UNetPRes tree; measured by
scripts/r3_e2e_attribution.py: 3.1 s per reference-artifact save). Packing
the tree into one flat device array and fetching THAT costs one roundtrip;
the ravel/concat dispatches are async and overlap.

On a directly-attached TPU the win is smaller but still real (fewer, larger
DMA transfers).
"""

from __future__ import annotations

import numpy as np

import jax


def fetch_tree_to_host(tree):
    """Fetch a pytree of (device or host) arrays to host numpy with one
    device->host transfer per dtype group instead of one per leaf. Returns a
    tree of np.ndarray with identical structure/shapes/dtypes/values."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    device_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not device_idx:
        return jax.tree_util.tree_unflatten(treedef, [np.asarray(l) for l in leaves])

    import jax.numpy as jnp

    out = [None] * len(leaves)
    for i, l in enumerate(leaves):
        if i not in device_idx:
            out[i] = np.asarray(l)

    # group device leaves by dtype (concatenate cannot mix dtypes)
    by_dtype: dict = {}
    for i in device_idx:
        by_dtype.setdefault(jnp.asarray(leaves[i]).dtype, []).append(i)
    for dtype, idxs in by_dtype.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        host = np.asarray(flat)  # the single roundtrip for this group
        offset = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = host[offset : offset + n].reshape(leaves[i].shape)
            offset += n
    return jax.tree_util.tree_unflatten(treedef, out)
