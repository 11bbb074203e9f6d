"""Cross-round regression guard: a fixed-seed tiny training run must keep
producing the same loss trajectory (CPU backend, parity precision). Protects
refactors in later rounds from silently changing training semantics.

If this test fails after an INTENTIONAL semantic change, regenerate with:
    python3 tests/test_golden_regression.py regen
"""

import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "train_losses_seed7.json")


def _run():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import matmul_precision

    with matmul_precision("parity"):
        x_train, _, y_train, _ = synthetic_split(12, 2, size=16, seed=7)
        model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.5, nbf=16)
        tx = adam_step_lr(1e-3, 0.666, 1e6)
        state = create_train_state(model, tx, jax.random.PRNGKey(7), (16, 16, 1))
        X = jnp.asarray(np.transpose(x_train.astype(np.float32), (0, 2, 3, 1)))
        Y = jnp.asarray(y_train.astype(np.float32)[:, 0])
        Xl, Yl = reshape_stream(X, Y, lanes=1)
        epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
        losses = []
        for epoch in range(2):
            state = state._replace(hebb=jnp.zeros_like(state.hebb))
            state, l = epoch_fn(state, Xl, Yl, jax.random.fold_in(jax.random.PRNGKey(7), epoch))
            losses.extend(np.asarray(l, dtype=np.float64).tolist())
    return losses


def test_golden_loss_trajectory():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file missing — run `python3 tests/test_golden_regression.py regen`")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    losses = _run()
    np.testing.assert_allclose(losses, golden["losses"], atol=1e-5)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        # mirror conftest: CPU backend + parity precision
        import jax

        jax.config.update("jax_platforms", "cpu")
        losses = _run()
        with open(GOLDEN_PATH, "w") as f:
            json.dump({"losses": losses, "note": "seed-7 2-epoch CPU parity run"}, f, indent=1)
        print("regenerated", GOLDEN_PATH)
