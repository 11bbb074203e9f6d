"""Test configuration: force an 8-virtual-device CPU platform so sharding /
mesh tests run without TPU hardware (SURVEY.md §4), and keep everything in
fp32 for parity checks."""

import os

# Force the CPU platform with 8 virtual devices. NOTE: this environment
# pre-imports jax at interpreter start (sitecustomize registers the axon TPU
# plugin), so env vars alone are too late — use jax.config.update, which works
# as long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"


@pytest.fixture(autouse=True)
def _parity_precision():
    """All tests run in fp32 parity mode (true-f32 matmuls/convs)."""
    from plastic_unet_tpu.utils import matmul_precision

    with matmul_precision("parity"):
        yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def has_reference():
    return os.path.isdir(REFERENCE_SRC)


def import_reference_module(name):
    """Import a module from the read-only reference tree for golden
    comparisons (behavioral parity tests only — nothing is copied)."""
    import importlib.util
    import sys

    path = os.path.join(REFERENCE_SRC, *name.split(".")) + ".py"
    spec = importlib.util.spec_from_file_location("ref_" + name.replace(".", "_"), path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod
