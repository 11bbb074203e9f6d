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

# Isolate the persistent XLA compilation cache: CLI-driving tests call
# enable_compilation_cache(), which is process-global — without this, CPU
# test processes read AND write the production TPU cache dir. Concurrent
# test batches once corrupted an entry there, and a later cache READ
# segfaulted the whole suite (jax compilation_cache.get_executable_and_time).
# A per-session temp dir keeps tests self-contained and the real cache clean.
import atexit
import shutil
import tempfile

_test_xla_cache_dir = tempfile.mkdtemp(prefix="plastic_unet_test_xla_")
os.environ["PLASTIC_UNET_XLA_CACHE"] = _test_xla_cache_dir
atexit.register(shutil.rmtree, _test_xla_cache_dir, ignore_errors=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"


@pytest.fixture(autouse=True)
def _bound_jit_memory_maps():
    """Keep the process under vm.max_map_count (default 65,530).

    Every compiled XLA CPU executable holds LLVM-JIT code mappings; a full
    suite run accumulates them monotonically (measured ~2,000 maps per
    test-file late in the run) until mmap fails and LLVM SEGFAULTS mid-
    compile — reproduced at exactly maps==65,530, three times, at ~75% of
    the suite. Clearing jax's executable caches releases the mappings
    (measured 1,198 -> 475 in a 60-jit probe), so drop them whenever the
    map count passes a safety threshold. Threshold-gated to keep warm jit
    caches for the vast majority of tests."""
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        return
    if n_maps > 30_000:
        import jax as _jax

        _jax.clear_caches()


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
