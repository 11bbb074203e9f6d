"""2-process `jax.distributed` staging test (VERDICT r02 next-round item 3).

The multi-process branch of the input pipeline
(parallel/multihost.py:58-65: `local_lane_block` +
`jax.make_array_from_process_local_data`) only activates when
`jax.process_count() > 1`, which a single pytest process can never produce.
Here we spawn two real coordinator/worker subprocesses (4 virtual CPU
devices each, Gloo collectives), each staging only ITS slice of the sample
stream, run one data-parallel epoch on the resulting global arrays, and
assert the losses and final parameters match a single-process 8-device run
of the same computation — the multi-host pipeline is observationally
equivalent to the single-host one.

Tolerance note: the FIRST step's loss is bit-identical (the staged global
arrays are exactly equal), but the gradient pmean's reduction ORDER differs
between single-process XLA all-reduce and the 2-process Gloo ring, so from
step 2 on values agree only to reduction-order rounding (~1e-8 observed).
Equality is asserted at float32 resolution — the same class of tolerance
torch-parity tests use for cross-framework accumulation-order differences.

Reference anchor: the reference has no distributed code at all (SURVEY.md
§2.3); this pins the TPU-native multi-host capability extension.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    # keep any existing entries (e.g. the axon plugin site dir) after the repo
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO_ROOT + (os.pathsep + extra if extra else "")
    # the worker picks its own device count; drop the conftest-style forcing
    env.pop("XLA_FLAGS", None)
    return env


def _run_workers(nproc: int, out_path: str, timeout: int = 600, scenario: str = "epoch"):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), out_path, scenario],
            env=_worker_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=REPO_ROOT,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out}"
    with open(out_path) as f:
        return json.load(f)


def test_two_process_staging_matches_single_process(tmp_path):
    import numpy as np

    single = _run_workers(1, str(tmp_path / "single.json"))
    multi = _run_workers(2, str(tmp_path / "multi.json"))

    assert single["process_count"] == 1 and multi["process_count"] == 2
    assert len(multi["losses"]) == len(single["losses"]) == 2  # 16 samples / 8 lanes
    # step 1 runs on identical staged data and params -> bit-identical
    assert multi["losses"][0] == single["losses"][0]
    # later steps: reduction-order tolerance only (see module docstring)
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=0, atol=1e-6)
    p1 = np.load(str(tmp_path / "single.json.params.npy"))
    p2 = np.load(str(tmp_path / "multi.json.params.npy"))
    assert p1.shape == p2.shape and p1.size > 1000
    np.testing.assert_allclose(p2, p1, rtol=0, atol=1e-6)


def test_two_process_multi_epoch_dispatch(tmp_path):
    """cfg.epochs_per_dispatch>1 under REAL multiprocess (VERDICT r03 item
    5): the K=2 DP multi-epoch dispatch (shard-local shuffle inside the
    shard_map body) over 2 Gloo processes matches the single-process
    8-device run of the same dispatch."""
    import numpy as np

    single = _run_workers(1, str(tmp_path / "single.json"), scenario="multi")
    multi = _run_workers(2, str(tmp_path / "multi.json"), scenario="multi")

    assert len(multi["losses"]) == len(single["losses"]) == 4  # K=2 x 2 steps
    # No step-1 bit-identity here (unlike the per-epoch scenario): the
    # K-epoch dispatch compiles its loss/grad pmean with a different
    # reduction grouping than the per-epoch graph, so single-process XLA
    # all-reduce vs the 2-process hierarchical (intra-process + Gloo)
    # reduction differ by rounding order from the very first step
    # (observed 6e-8). Reduction-order tolerance throughout.
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=0, atol=1e-6)
    p1 = np.load(str(tmp_path / "single.json.params.npy"))
    p2 = np.load(str(tmp_path / "multi.json.params.npy"))
    np.testing.assert_allclose(p2, p1, rtol=0, atol=1e-6)


def test_two_process_orbax_save_restore_continue(tmp_path):
    """Orbax save -> restore -> continue across 2 real processes (VERDICT
    r03 item 5): every process participates in the save of the sharded
    TrainState; the restore is exact (params, Adam moments, trace, step);
    training continues and matches the single-process run."""
    import numpy as np

    single = _run_workers(1, str(tmp_path / "single.json"), scenario="orbax")
    multi = _run_workers(2, str(tmp_path / "multi.json"), scenario="orbax")

    for rec in (single, multi):
        assert rec["restore_max_diff"] == 0.0  # exact roundtrip
        assert rec["restored_step"] == 2  # 16 samples / 8 lanes = 2 steps
    assert len(multi["losses"]) == len(single["losses"]) == 4  # 2 epochs x 2
    assert multi["losses"][0] == single["losses"][0]
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=0, atol=1e-6)
    p1 = np.load(str(tmp_path / "single.json.params.npy"))
    p2 = np.load(str(tmp_path / "multi.json.params.npy"))
    np.testing.assert_allclose(p2, p1, rtol=0, atol=1e-6)
