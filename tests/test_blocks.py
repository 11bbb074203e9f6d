"""Block-level property tests: the pad/crop arithmetic vs torch F.pad over a
sweep of size differences, and max-pool floor semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from plastic_unet_tpu.models.blocks import max_pool_2x2, pad_to_match

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("src,tgt", [(13, 12), (25, 25), (51, 50), (7, 10), (8, 11), (9, 6), (10, 13)])
def test_pad_to_match_vs_torch_fpad(src, tgt, rng):
    """pad_to_match must equal F.pad(x, (d//2, int(d/2), d//2, int(d/2)))
    for positive and negative diffs (reference unet_p_res.py:215-217)."""
    x = rng.standard_normal((1, 3, src, src)).astype(np.float32)  # NCHW for torch
    d = tgt - src
    want = F.pad(torch.from_numpy(x), (d // 2, int(d / 2), d // 2, int(d / 2))).numpy()
    got = pad_to_match(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), want.shape[2], want.shape[3])
    np.testing.assert_array_equal(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


@pytest.mark.parametrize("size", [101, 50, 25, 12, 7])
def test_max_pool_floor(size, rng):
    x = rng.standard_normal((1, size, size, 2)).astype(np.float32)
    got = max_pool_2x2(jnp.asarray(x))
    want = torch.nn.MaxPool2d(2)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert got.shape[1] == size // 2
    np.testing.assert_array_equal(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)
