"""Subprocess worker for test_multihost_distributed.py (NOT a pytest file).

Runs as one of N `jax.distributed` processes (CPU backend, 8 global virtual
devices split across processes), executes the REAL multi-process input
pipeline — `process_local_slice` + `stage_global_stream`
(parallel/multihost.py:58-65, the branch that only activates when
jax.process_count() > 1) — then one data-parallel epoch via
`make_dp_epoch_fn`, and dumps losses + a parameter fingerprint to JSON.

Usage: python3 multihost_worker.py <process_id> <num_processes> <port> <out.json>

With num_processes=1 it runs the identical computation single-process
(8 local devices) — the golden the 2-process run must match bit-for-bit.
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    local_devices = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )
    assert jax.device_count() == 8, jax.devices()
    assert jax.process_count() == nproc

    import numpy as np

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.parallel import dp_state_sharding, make_dp_epoch_fn, make_mesh
    from plastic_unet_tpu.parallel.multihost import process_local_slice, stage_global_stream
    from plastic_unet_tpu.train.loop import create_train_state
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils.precision import matmul_precision

    SIZE, N = 16, 16
    with matmul_precision("parity"):
        imgs, masks = synthetic_tiles(N, size=SIZE, seed=5)
        X = np.ascontiguousarray(np.transpose(imgs.astype(np.float32), (0, 2, 3, 1)))
        Y = np.ascontiguousarray(masks[:, 0].astype(np.float32))

        model = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2)
        tx = adam_step_lr(3e-4, 0.666, 1e5)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=8)
        # Host-local numpy leaves are replicated-by-value across processes
        # (same seed); a global jit with out_shardings stages them onto the
        # 8-device mesh (params/opt replicated, hebb lane-sharded) — the
        # standard multi-host staging recipe.
        state = jax.tree.map(np.asarray, state)
        mesh = make_mesh(8)
        rep, lane = dp_state_sharding(mesh)
        shardings = state._replace(
            params=jax.tree.map(lambda _: rep, state.params),
            opt_state=jax.tree.map(lambda _: rep, state.opt_state),
            hebb=lane,
            step=rep,
        )
        state = jax.jit(lambda s: s, out_shardings=shardings)(state)

        # THE path under test: each process stages only its sample slice.
        sl = process_local_slice(N)
        Xl, Yl = stage_global_stream(X[sl], Y[sl], mesh, lanes_per_device=1)

        epoch_fn = make_dp_epoch_fn(model, tx, mesh)
        state, losses = epoch_fn(state, Xl, Yl, jax.random.PRNGKey(1))
        losses = np.asarray(losses, dtype=np.float64)

        flat = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(state.params)])

    if pid == 0:
        np.save(out_path + ".params.npy", flat)
        with open(out_path, "w") as f:
            json.dump({"losses": losses.tolist(), "process_count": nproc}, f)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
