"""Subprocess worker for test_multihost_distributed.py (NOT a pytest file).

Runs as one of N `jax.distributed` processes (CPU backend, 8 global virtual
devices split across processes), executes the REAL multi-process input
pipeline — `process_local_slice` + `stage_global_stream`
(parallel/multihost.py:58-65, the branch that only activates when
jax.process_count() > 1) — then one of three scenarios, and dumps losses +
a parameter fingerprint to JSON:

  epoch  one data-parallel epoch via `make_dp_epoch_fn` (the r2 scenario)
  multi  a K=2 multi-epoch dispatch via `make_dp_multi_epoch_fn` with
         shard-local shuffle — the cfg.epochs_per_dispatch>1 DP path under
         real multiprocess (VERDICT r03 item 5)
  orbax  epoch 1 -> orbax_save (all processes participate) -> restore into
         a freshly-initialized sharded state -> epoch 2 — exact
         save/restore/continue across processes (VERDICT r03 item 5)

Usage: python3 multihost_worker.py <process_id> <num_processes> <port>
                                   <out.json> [scenario]

With num_processes=1 it runs the identical computation single-process
(8 local devices) — the golden the 2-process run must match bit-for-bit
(step 1) / to reduction-order tolerance (later steps).
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    scenario = sys.argv[5] if len(sys.argv) > 5 else "epoch"
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

    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.parallel import dp_state_sharding, make_dp_epoch_fn, make_mesh
    from plastic_unet_tpu.parallel.multihost import process_local_slice, stage_global_stream
    from plastic_unet_tpu.train.loop import create_train_state
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils.precision import matmul_precision

    SIZE, N = 16, 16

    def fresh_sharded_state(model, tx, mesh):
        """Host-local numpy leaves are replicated-by-value across processes
        (same seed); a global jit with out_shardings stages them onto the
        8-device mesh (params/opt replicated, hebb lane-sharded) — the
        standard multi-host staging recipe."""
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=8)
        state = jax.tree.map(np.asarray, state)
        rep, lane = dp_state_sharding(mesh)
        shardings = state._replace(
            params=jax.tree.map(lambda _: rep, state.params),
            opt_state=jax.tree.map(lambda _: rep, state.opt_state),
            hebb=lane,
            step=rep,
        )
        return jax.jit(lambda s: s, out_shardings=shardings)(state)

    with matmul_precision("parity"):
        imgs, masks = synthetic_tiles(N, size=SIZE, seed=5)
        X = np.ascontiguousarray(np.transpose(imgs.astype(np.float32), (0, 2, 3, 1)))
        Y = np.ascontiguousarray(masks[:, 0].astype(np.float32))

        model = UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=2)
        tx = adam_step_lr(3e-4, 0.666, 1e5)
        mesh = make_mesh(8)
        state = fresh_sharded_state(model, tx, mesh)

        # THE path under test: each process stages only its sample slice.
        sl = process_local_slice(N)
        Xl, Yl = stage_global_stream(X[sl], Y[sl], mesh, lanes_per_device=1)

        extra = {}
        if scenario == "epoch":
            epoch_fn = make_dp_epoch_fn(model, tx, mesh)
            state, losses = epoch_fn(state, Xl, Yl, jax.random.PRNGKey(1))
        elif scenario == "multi":
            # K=2 epochs (shard-local shuffle on) in ONE shard_map dispatch
            from plastic_unet_tpu.parallel.dp import make_dp_multi_epoch_fn

            fn = make_dp_multi_epoch_fn(model, tx, mesh, shuffle=True)
            K = 2
            erngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), e) for e in range(K)])
            pkeys = jnp.stack([jax.random.PRNGKey(100 + e) for e in range(K)])
            akeys = jnp.stack([jax.random.PRNGKey(200 + e) for e in range(K)])
            state, losses = fn(state, Xl, Yl, erngs, pkeys, akeys)
            losses = losses.reshape(-1)  # (K, S) -> (K*S,)
        elif scenario == "orbax":
            from plastic_unet_tpu.train.checkpoint import orbax_restore, orbax_save

            epoch_fn = make_dp_epoch_fn(model, tx, mesh)
            state, l1 = epoch_fn(state, Xl, Yl, jax.random.PRNGKey(1))
            ckpt = out_path + ".orbax"
            orbax_save(ckpt, state)  # every process participates
            template = fresh_sharded_state(model, tx, mesh)
            restored = orbax_restore(ckpt, template)
            # restore must be EXACT (params, Adam moments, trace, step)
            diffs = [
                float(jnp.max(jnp.abs(a.astype(jnp.float64) - b.astype(jnp.float64))))
                for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state))
            ]
            extra["restore_max_diff"] = max(diffs)
            extra["restored_step"] = int(restored.step)
            # continue: fresh trace per epoch (train.py:88), epoch 2
            restored = restored._replace(hebb=jnp.zeros_like(restored.hebb))
            state, l2 = epoch_fn(restored, Xl, Yl, jax.random.PRNGKey(2))
            losses = jnp.concatenate([l1, l2])
        else:
            raise ValueError(f"unknown scenario {scenario!r}")

        losses = np.asarray(losses, dtype=np.float64)
        flat = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(state.params)])

    if pid == 0:
        np.save(out_path + ".params.npy", flat)
        with open(out_path, "w") as f:
            json.dump({"losses": losses.tolist(), "process_count": nproc, **extra}, f)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
