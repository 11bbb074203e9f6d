"""fold_hires (space-to-depth high-res levels) must be numerically
equivalent to the baseline model with the SAME parameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes


@pytest.mark.parametrize("size", [32, 101])
def test_fold_hires_equivalent(size, rng):
    if size == 101:
        pytest.importorskip("torch")  # just to keep runtime reasonable markers
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0)
    folded = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, fold_hires=True)
    x = jnp.asarray(rng.standard_normal((1, size, size, 1)).astype(np.float32))
    hebb = base.initial_zero_hebb(1)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)
    # identical param tree: folded variant initializes the same structure
    vs_f = folded.init(jax.random.PRNGKey(0), x, hebb)
    assert jax.tree.map(lambda a: a.shape, vs) == jax.tree.map(lambda a: a.shape, vs_f)

    o1 = base.apply(vs, x, hebb)
    o2 = folded.apply(vs, x, hebb)
    np.testing.assert_allclose(np.asarray(o2.activ), np.asarray(o1.activ), atol=5e-5)
    np.testing.assert_allclose(np.asarray(o2.activout), np.asarray(o1.activout), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2.hebb), np.asarray(o1.hebb), atol=1e-5)


def test_fold_hires_gradients_match(rng):
    """Gradients through the folded path equal the baseline's (same loss)."""
    size = 32
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0)
    folded = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, fold_hires=True)
    x = jnp.asarray(rng.standard_normal((1, size, size, 1)).astype(np.float32))
    tgt = jnp.asarray((rng.random((1, size, size)) > 0.5).astype(np.float32))
    hebb = base.initial_zero_hebb(1)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)

    def loss(m):
        def f(p):
            out = m.apply({"params": p}, x, hebb)
            return jnp.mean((out.activout - tgt) ** 2)
        return f

    g1 = jax.grad(loss(base))(vs["params"])
    g2 = jax.grad(loss(folded))(vs["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_fold_hires_train_mode_runs(rng):
    """Dropout path shapes work in folded mode (mask applied unfolded)."""
    size = 32
    m = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.5, fold_hires=True)
    x = jnp.asarray(rng.standard_normal((2, size, size, 1)).astype(np.float32))
    hebb = m.initial_zero_hebb(2)
    vs = m.init(jax.random.PRNGKey(0), x, hebb)
    out = m.apply(vs, x, hebb, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.activout.shape == (2, size, size)
    assert bool(jnp.all(jnp.isfinite(out.activout)))
