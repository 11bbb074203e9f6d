"""MXU-aligned padded trunk mode (cfg.trunk_pad, VERDICT r02 item 2).

trunk_pad pads inputs spatially (reflect) to a power-of-two canvas before
the encoder and center-crops the trunk logits back to (nbf, nbf) before the
plastic head. It is a geometry EXTENSION (receptive fields change), so there
is no torch-parity pin; these tests pin its contracts instead:
  * output geometry is unchanged — (B, nbf, nbf) masks either way;
  * the parameter tree is IDENTICAL to trunk_pad=0 (convs are spatially
    shape-agnostic), so .pth/orbax checkpoints interchange freely;
  * trunk_pad == input size is exactly the unpadded model (no-op pad);
  * training through the full driver runs and produces finite losses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes

SIZE = 16


def _init(model, batch=1):
    x0 = jnp.zeros((batch, SIZE, SIZE, 1))
    return model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(batch))["params"]


def test_padded_forward_geometry(rng):
    model = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2, trunk_pad=32)
    params = _init(model)
    x = jnp.asarray(rng.standard_normal((3, SIZE, SIZE, 1)).astype(np.float32))
    out = model.apply({"params": params}, x, model.initial_zero_hebb(3))
    assert out.activout.shape == (3, SIZE, SIZE)
    assert out.hebb.shape == (3, SIZE, SIZE)
    assert np.all(np.isfinite(np.asarray(out.activout)))
    # sigmoid output range
    a = np.asarray(out.activout)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_param_tree_identical_to_unpadded():
    """Checkpoints interchange: the padded trunk must not change any param
    shape (convs are spatially agnostic; the head is (nbf, nbf) either way)."""
    plain = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2)
    padded = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2, trunk_pad=32)
    p0, p1 = _init(plain), _init(padded)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    assert [(k, v.shape) for k, v in flat0] == [(k, v.shape) for k, v in flat1]


def test_pad_equal_to_input_is_noop(rng):
    """trunk_pad == input size must be bit-identical to trunk_pad=0."""
    plain = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2)
    padded = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2, trunk_pad=SIZE)
    params = _init(plain)
    x = jnp.asarray(rng.standard_normal((2, SIZE, SIZE, 1)).astype(np.float32))
    h = plain.initial_zero_hebb(2)
    o0 = plain.apply({"params": params}, x, h)
    o1 = padded.apply({"params": params}, x, h)
    np.testing.assert_array_equal(np.asarray(o0.activout), np.asarray(o1.activout))
    np.testing.assert_array_equal(np.asarray(o0.hebb), np.asarray(o1.hebb))


def test_pad_smaller_than_input_raises():
    model = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2, trunk_pad=8)
    with pytest.raises(ValueError, match="trunk_pad"):
        _init(model)


def test_padded_training_through_driver(tmp_path):
    """Full driver run with trunk_pad: finite losses, reference artifacts."""
    import os

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(6, 3, size=SIZE, seed=9)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "pad"), epochs=2, lr=3e-4, val_every=2, save_every=2,
        im_width=SIZE, im_height=SIZE, im_chan=1, neurons=2, dropout_ratio=0.25,
        trunk_pad=32, matmul_precision="parity",
    )
    res = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert np.all(np.isfinite(res.all_losses))
    assert os.path.exists(str(tmp_path / "pad" / "train_data.hdf5"))
    # padded-mode losses actually move (training is live, not a constant fn)
    assert res.all_losses[0] != res.all_losses[-1]


def test_trunk_pad_too_large_for_reflect_raises():
    """reflect padding needs per-side width < input size: trunk_pad beyond
    3*h-2 raises a clear ValueError instead of an obscure XLA pad error."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.models import UNetPRes

    model = UNetPRes(nbf=16, neurons=2, trunk_pad=128)
    with pytest.raises(ValueError, match="too large"):
        model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), model.initial_zero_hebb(1)
        )
