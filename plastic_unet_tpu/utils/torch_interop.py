"""PyTorch checkpoint interop: load reference ``.pth`` state_dicts into the
flax models (and export back), enabling (a) drop-in migration of trained
reference checkpoints and (b) the port-verification parity tests
(SURVEY.md §7 stage 3).

Weight layout conversions (verified exact in tests/test_model_parity.py):
  Conv2d          (O,I,kh,kw)   -> flax Conv kernel (kh,kw,I,O)
  ConvTranspose2d (I,O,kh,kw)   -> flax ConvTranspose(transpose_kernel=True)
                                   kernel (kh,kw,O,I)

Name maps cover UNetpRes (src/unet/unet_p_res.py) and UNetp
(src/unet/unet_p.py) in their batch_norm=False configuration (the only one
the reference drivers use: train.py:288). torch is only required inside
these functions (reading .pth); numpy state_dicts work without torch.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv_entry(flax_path: tuple, torch_prefix: str):
    return {
        flax_path + ("kernel",): (torch_prefix + ".weight", (2, 3, 1, 0)),
        flax_path + ("bias",): (torch_prefix + ".bias", None),
    }


def _convT_entry(flax_path: tuple, torch_prefix: str):
    return {
        flax_path + ("kernel",): (torch_prefix + ".weight", (2, 3, 1, 0)),
        flax_path + ("bias",): (torch_prefix + ".bias", None),
    }


def _res_block(flax_path: tuple, torch_prefix: str):
    """residual_block (unet_p_res.py:166-189): conv.1/conv.2 are conv_modules
    whose inner Conv2d is at .conv (no batch_norm)."""
    m = {}
    m.update(_conv_entry(flax_path + ("ConvModule_0", "Conv_0"), torch_prefix + ".conv.1.conv"))
    m.update(_conv_entry(flax_path + ("ConvModule_1", "Conv_0"), torch_prefix + ".conv.2.conv"))
    return m


def _down_or_middle(flax_path: tuple, torch_prefix: str, seq: str):
    """down/middle (unet_p_res.py:223-272): Sequential(Conv2d, res, res, ReLU)."""
    m = {}
    m.update(_conv_entry(flax_path + ("Conv_0",), f"{torch_prefix}.{seq}.0"))
    m.update(_res_block(flax_path + ("ResidualBlock_0",), f"{torch_prefix}.{seq}.1"))
    m.update(_res_block(flax_path + ("ResidualBlock_1",), f"{torch_prefix}.{seq}.2"))
    return m


def unetp_res_name_map() -> dict:
    """flax param path -> (torch state_dict key, transpose) for UNetpRes."""
    m = {
        ("w",): ("w", None),
        ("alpha",): ("alpha", None),
        ("eta",): ("eta", None),
    }
    for i in range(4):
        m.update(_down_or_middle((f"DownRes_{i}",), f"conv{i + 1}", "dconv"))
    m.update(_down_or_middle(("Middle_0",), "mid", "mconv"))
    for i, t in enumerate(["uconv4", "uconv3", "uconv2", "uconv1"]):
        m.update(_convT_entry((f"UpRes_{i}", "ConvTranspose_0"), f"{t}.dconv"))
        m.update(_down_or_middle((f"UpRes_{i}", "Middle_0"), f"{t}.uconv.1", "mconv"))
    m.update(_conv_entry(("Conv_0",), "outc.conv"))
    return m


def _double_conv(flax_path: tuple, torch_prefix: str):
    """double_conv (unet_p.py:96-122, no BN): Sequential(Conv2d, ReLU, Conv2d, ReLU)."""
    m = {}
    m.update(_conv_entry(flax_path + ("Conv_0",), torch_prefix + ".conv.0"))
    m.update(_conv_entry(flax_path + ("Conv_1",), torch_prefix + ".conv.2"))
    return m


def unetp_name_map(bilinear_upsample: bool = False) -> dict:
    """flax param path -> (torch key, transpose) for UNetp (unet_p.py:8-94)."""
    m = {
        ("w",): ("w", None),
        ("alpha",): ("alpha", None),
        ("eta",): ("eta", None),
    }
    m.update(_double_conv(("DoubleConv_0",), "inc.conv"))
    for i, t in enumerate(["down1", "down2", "down3", "down4"]):
        m.update(_double_conv((f"DoubleConv_{i + 1}",), f"{t}.mpconv.1"))
    for i, t in enumerate(["up1", "up2", "up3", "up4"]):
        if not bilinear_upsample:
            m.update(_convT_entry((f"UpClassic_{i}", "ConvTranspose_0"), f"{t}.up"))
        m.update(_double_conv((f"UpClassic_{i}", "DoubleConv_0"), f"{t}.conv"))
    m.update(_conv_entry(("Conv_0",), "outc.conv"))
    return m


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # Copy: torch .numpy() aliases live parameter memory, and in-place
    # optimizer steps would otherwise mutate the converted arrays.
    return np.array(v, copy=True)


def state_dict_to_flax_params(state_dict: Mapping[str, Any], name_map: dict) -> dict:
    """Build the flax ``params`` dict from a torch state_dict (or any mapping
    of the same keys to arrays)."""
    import jax.numpy as jnp

    params: dict = {}
    for flax_path, (torch_key, perm) in name_map.items():
        if torch_key not in state_dict:
            raise KeyError(f"torch key {torch_key!r} missing (wanted for {'/'.join(flax_path)})")
        arr = _to_numpy(state_dict[torch_key])
        if perm is not None:
            arr = np.transpose(arr, perm)
        node = params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = jnp.asarray(arr)
    return params


def flax_params_to_state_dict(params: Mapping, name_map: dict) -> dict:
    """Inverse conversion: flax params -> a torch-layout state_dict of numpy
    arrays (pass through torch.save for a reference-compatible .pth)."""
    out = {}
    for flax_path, (torch_key, perm) in name_map.items():
        node = params
        for p in flax_path:
            node = node[p]
        arr = np.asarray(node)
        if perm is not None:
            inv = np.argsort(perm)
            arr = np.transpose(arr, inv)
        out[torch_key] = arr
    return out


def load_pth(path: str) -> dict:
    """Read a torch .pth state_dict (CPU). Requires torch."""
    import torch

    return torch.load(path, map_location="cpu")


def save_pth(state_dict: Mapping[str, Any], path: str) -> None:
    """Write a reference-compatible .pth (torch tensors on CPU)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(_to_numpy(v))) for k, v in state_dict.items()}, path)


def load_unetp_res_pth(path: str) -> dict:
    """One-call loader: reference UNetpRes .pth -> flax params pytree."""
    return state_dict_to_flax_params(load_pth(path), unetp_res_name_map())


def load_unetp_pth(path: str, bilinear_upsample: bool = False) -> dict:
    """One-call loader: reference UNetp .pth -> flax params pytree."""
    return state_dict_to_flax_params(load_pth(path), unetp_name_map(bilinear_upsample))
