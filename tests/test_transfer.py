"""utils.transfer.fetch_tree_to_host: the packed device->host fetch must be
value-identical to per-leaf np.asarray (it exists purely to collapse
O(leaves) relay roundtrips into one per dtype group — PERF.md round 3)."""

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.utils.transfer import fetch_tree_to_host


def test_packed_fetch_identical(rng):
    tree = {
        "a": jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32)),
        "b": {"c": jnp.asarray(rng.standard_normal((7,)).astype(np.float32)),
              "d": jnp.asarray(rng.integers(0, 10, (2, 2)).astype(np.int32))},
        "e": jnp.asarray(rng.standard_normal((1,)).astype(np.float32)),
    }
    out = fetch_tree_to_host(tree)
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert isinstance(b, np.ndarray)
        assert b.dtype == a.dtype and b.shape == a.shape
        np.testing.assert_array_equal(b, np.asarray(a))


def test_numpy_and_mixed_trees_pass_through(rng):
    host = {"x": rng.standard_normal((4,)).astype(np.float32)}
    out = fetch_tree_to_host(host)
    np.testing.assert_array_equal(out["x"], host["x"])

    mixed = {"x": host["x"], "y": jnp.ones((2, 3), jnp.float32)}
    out = fetch_tree_to_host(mixed)
    np.testing.assert_array_equal(out["x"], host["x"])
    np.testing.assert_array_equal(out["y"], np.ones((2, 3), np.float32))
    assert all(isinstance(l, np.ndarray) for l in jax.tree.leaves(out))


def test_checkpoint_roundtrip_uses_packed_fetch(tmp_path, rng):
    """save_reference_artifacts on a device-array tree still writes the exact
    values (integration of the packed fetch into the checkpoint writer)."""
    import h5py

    from plastic_unet_tpu.train.checkpoint import save_reference_artifacts

    params = {
        "w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32)),
        "alpha": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32)),
        "eta": jnp.asarray(np.ones(1, np.float32) * 0.01),
    }
    prefix = str(tmp_path / "chk")
    save_reference_artifacts(prefix, params, {"p": 1}, [0.5, 0.4], [0.5], [0.6], [0.7])
    with h5py.File(prefix + "_data.hdf5", "r") as f:
        np.testing.assert_array_equal(np.asarray(f["net"]["w"]), np.asarray(params["w"]))
        np.testing.assert_array_equal(np.asarray(f["net"]["alpha"]), np.asarray(params["alpha"]))
        np.testing.assert_array_equal(np.asarray(f["net"]["eta"]), np.asarray(params["eta"]))
