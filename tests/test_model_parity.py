"""Port-verification parity: the flax models, fed the reference torch
models' weights, must reproduce the torch forward outputs at fp32
(SURVEY.md §7 stage 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetP, UNetPRes
from plastic_unet_tpu.utils.torch_interop import (
    flax_params_to_state_dict,
    state_dict_to_flax_params,
    unetp_name_map,
    unetp_res_name_map,
)

from conftest import has_reference, import_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")

ATOL = 2e-5  # fp32 conv-stack accumulation across ~20 layers


def _forward_pair(ref_net, flax_model, nbf, size, rule, rng):
    """Run both nets on the same input/hebb in eval mode; return outputs."""
    ref_net.eval()
    x = rng.standard_normal((1, 1, size, size)).astype(np.float32)
    hebb = (rng.standard_normal((nbf, nbf)) * 0.1).astype(np.float32)

    with torch.no_grad():
        t_out, t_hebb = ref_net(torch.from_numpy(x), torch.from_numpy(hebb))

    params = state_dict_to_flax_params(
        ref_net.state_dict(), unetp_res_name_map() if isinstance(flax_model, UNetPRes) else unetp_name_map()
    )
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = flax_model.apply({"params": params}, x_nhwc, jnp.asarray(hebb)[None], train=False)
    return t_out.numpy(), t_hebb.numpy(), np.asarray(out.activout[0]), np.asarray(out.hebb[0])


@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_unetp_res_forward_parity(rule, rng):
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(
        n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=101, rule=rule, batch_norm=False
    )
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, rule=rule)
    t_out, t_hebb, j_out, j_hebb = _forward_pair(ref_net, model, 101, 101, rule, rng)
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)
    np.testing.assert_allclose(j_hebb, t_hebb, atol=ATOL)


def test_unetp_res_neurons8_parity(rng):
    """The tuned config uses start_neurons=8 (unet_p_res_script.py:30)."""
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=101, neurons=8)
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=8)
    t_out, t_hebb, j_out, j_hebb = _forward_pair(ref_net, model, 101, 101, "hebb", rng)
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)
    np.testing.assert_allclose(j_hebb, t_hebb, atol=ATOL)


def test_unetp_forward_parity(rng):
    """Classic UNetp at 128 px (its only working geometry, SURVEY.md §2.1)."""
    ref_mod = import_reference_module("unet.unet_p")
    ref_net = ref_mod.UNetp(n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=128)
    model = UNetP(n_channels=1, n_classes=1, nbf=128)
    t_out, t_hebb, j_out, j_hebb = _forward_pair(ref_net, model, 128, 128, "hebb", rng)
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)
    np.testing.assert_allclose(j_hebb, t_hebb, atol=ATOL)


def test_unetp_bilinear_forward_parity(rng):
    """UNetp with bilinear_upsample=True (align-corners Upsample path,
    unet_p.py:152-153)."""
    ref_mod = import_reference_module("unet.unet_p")
    ref_net = ref_mod.UNetp(
        n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=128, bilinear_upsample=True
    )
    model = UNetP(n_channels=1, n_classes=1, nbf=128, bilinear_upsample=True)
    ref_net.eval()
    x = rng.standard_normal((1, 1, 128, 128)).astype(np.float32)
    hebb = (rng.standard_normal((128, 128)) * 0.1).astype(np.float32)
    with torch.no_grad():
        t_out, t_hebb = ref_net(torch.from_numpy(x), torch.from_numpy(hebb))
    params = state_dict_to_flax_params(ref_net.state_dict(), unetp_name_map(bilinear_upsample=True))
    out = model.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(hebb)[None], train=False
    )
    np.testing.assert_allclose(np.asarray(out.activout[0]), t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.hebb[0]), t_hebb.numpy(), atol=ATOL)


def test_param_count_matches_reference():
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=101)
    n_torch = sum(p.numel() for p in ref_net.parameters())
    model = UNetPRes(nbf=101)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1)
    )
    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vs))
    assert n_flax == n_torch


def test_state_dict_roundtrip(rng):
    """flax -> torch-layout -> flax roundtrips exactly."""
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(n_channels=1, n_classes=1, device=torch.device("cpu"), nbf=101)
    nm = unetp_res_name_map()
    params = state_dict_to_flax_params(ref_net.state_dict(), nm)
    sd = flax_params_to_state_dict(params, nm)
    for k, v in ref_net.state_dict().items():
        np.testing.assert_array_equal(sd[k], v.numpy())


def test_batched_inference_equals_sequential(rng):
    """Batched (B>1) zero-trace inference must equal per-sample inference —
    validating the batching capability extension."""
    model = UNetPRes(nbf=101)
    vs = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1))
    xb = jnp.asarray(rng.standard_normal((4, 101, 101, 1)).astype(np.float32))
    hb = model.initial_zero_hebb(4)
    out_b = model.apply(vs, xb, hb)
    for i in range(4):
        out_1 = model.apply(vs, xb[i : i + 1], model.initial_zero_hebb(1))
        np.testing.assert_allclose(np.asarray(out_b.activout[i]), np.asarray(out_1.activout[0]), atol=1e-6)
