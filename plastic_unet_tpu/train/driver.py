"""Training driver — the reference train()/start_train() flow
(src/train.py:29-314) rebuilt around the jitted whole-epoch scan.

Reproduced observable behaviors:
  * per-epoch hebb re-zero (train.py:88) and the per-sample update stream
  * predictive wall-clock stop: terminate when the *estimated* end of the
    next epoch would exceed stop_time (train.py:118-122, 206-211)
  * validation every val_every epochs and at termination (train.py:131-147)
  * checkpoints every save_every epochs and at termination, with filename
    rollout every `rollout` epochs (train.py:153-203); artifacts in the
    reference's exact HDF5/pickle/.pth formats (see train.checkpoint)
  * KeyboardInterrupt -> INTERRUPTED checkpoint (train.py:306-312)
  * resume from a .pth (train.py:293-296) or from an Orbax TrainState
  * the train.py:115 epoch-loss quirk (np.mean of the single element
    all_losses[-N]) is reproduced when cfg.quirk_epoch_loss (default);
    setting it False uses the intended mean over the epoch — a documented,
    opt-in fix (SURVEY.md §2.1).

TPU-native differences: the sample stream lives on device for the whole
epoch; losses come back as one (S,) array per epoch; the model is selected
by cfg.arch; matmul precision follows cfg.matmul_precision.
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.eval.evaluate import eval_net
from plastic_unet_tpu.models import UNetP, UNetPRes
from plastic_unet_tpu.ops.augment import augment_stream
from plastic_unet_tpu.train.checkpoint import orbax_save, save_reference_artifacts
from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn, reshape_stream
from plastic_unet_tpu.train.optimizer import adam_step_lr
from plastic_unet_tpu.utils.precision import matmul_precision


def build_model(cfg: TrainConfig):
    """Instantiate the configured model family (nbf = img width, as at every
    reference call site, train.py:285-288)."""
    if cfg.arch == "unet_res":
        import jax.numpy as jnp

        return UNetPRes(
            n_channels=cfg.im_chan,
            n_classes=1,
            neurons=cfg.neurons,
            dropout_ratio=cfg.dropout_ratio,
            alfa_type=cfg.alfa_type,
            rule=cfg.prule,
            nbf=cfg.im_width,
            batch_norm=cfg.batch_norm,
            bilinear_upsample=cfg.bilinear_upsample,
            use_pallas=cfg.use_pallas,
            pallas_trunk=cfg.pallas_trunk,
            fast_dw=cfg.fast_dw,
            remat_trunk=cfg.remat_trunk,
            patch_conv=cfg.patch_conv,
            trunk_pad=cfg.trunk_pad,
            plastic=cfg.plastic,
            compute_dtype=None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype).type,
        )
    if cfg.arch == "unet":
        # UNetP supports none of the trunk-surgery knobs; reject rather than
        # silently ignore (e.g. a user told --trunk-pad "must match how the
        # model was trained" must not get an unpadded model without warning).
        unsupported = {
            "trunk_pad": cfg.trunk_pad,
            "patch_conv": cfg.patch_conv,
            "pallas_trunk": cfg.pallas_trunk,
            "fast_dw": cfg.fast_dw,
            "remat_trunk": cfg.remat_trunk,
        }
        bad = [k for k, v in unsupported.items() if v]
        if cfg.compute_dtype != "float32":
            bad.append("compute_dtype")
        if bad:
            raise ValueError(
                f"arch 'unet' does not support {bad}; these options apply to "
                "the unet_res trunk only"
            )
        return UNetP(
            n_channels=cfg.im_chan,
            n_classes=1,
            alfa_type=cfg.alfa_type,
            rule=cfg.prule,
            nbf=cfg.im_width,
            batch_norm=cfg.batch_norm,
            bilinear_upsample=cfg.bilinear_upsample,
            use_pallas=cfg.use_pallas,
        )
    raise ValueError(f"unknown arch {cfg.arch!r} (use 'unet_res' or 'unet')")


def name_map_for(cfg: TrainConfig):
    from plastic_unet_tpu.utils import torch_interop as ti

    m = ti.unetp_res_name_map() if cfg.arch == "unet_res" else ti.unetp_name_map(cfg.bilinear_upsample)
    if not cfg.plastic:
        # vanilla extension: no plastic-head params to map
        m = {k: v for k, v in m.items() if k not in (("w",), ("alpha",), ("eta",))}
    return m


def chunk_epochs(e: int, total_epochs: int, max_chunk: int, periods) -> int:
    """Multi-epoch-dispatch chunk size starting at epoch e (0-based): fold as
    many epochs as max_chunk allows, but never run PAST an epoch where a
    periodic event fires (validation/save/rollout trigger when
    (epoch+1) % period == 0, train.py:131/153/174) — the chunk's last epoch
    may BE the event epoch, so eval/checkpoint code sees the same state as
    the per-epoch path."""
    k = total_epochs - e
    for period in periods:
        if period > 0:
            k = min(k, period - (e % period))
    return max(1, min(k, max_chunk))


class TrainResult:
    def __init__(self, state, all_losses, val_train_losses, val_test_losses, val_accuracies, model):
        self.state = state
        self.all_losses = all_losses
        self.val_train_losses = val_train_losses
        self.val_test_losses = val_test_losses
        self.val_accuracies = val_accuracies
        self.model = model


def train(model, state: TrainState, x_train, x_val, y_train, y_val, cfg: TrainConfig, stop_time: float | None = None) -> TrainResult:
    """Run the epoch loop. Arrays arrive in the reference's NCHW contract and
    are staged to device NHWC once."""
    print("Train samples shape:", x_train.shape)
    print("Train labels shape:", y_train.shape)
    print("Validation samples shape:", x_val.shape)
    print("Validation labels shape:", y_val.shape)
    print(cfg)

    stop_time = cfg.stop_time if stop_time is None else stop_time
    if stop_time > 0:
        print(
            "Training started at: [%s] and set to stop at: [%s]"
            % (
                datetime.fromtimestamp(time.time()).strftime("%B %d, %Y %H:%M:%S"),
                datetime.fromtimestamp(stop_time).strftime("%B %d, %Y %H:%M:%S"),
            )
        )

    # Stage the stream on device (NHWC), split into lanes (and shard the
    # lane axis over a data mesh when cfg.devices > 1).
    X = jnp.asarray(np.transpose(np.asarray(x_train, np.float32), (0, 2, 3, 1)))
    Y = jnp.asarray(np.asarray(y_train, np.float32).reshape(y_train.shape[0], cfg.im_height, cfg.im_width))

    tx = adam_step_lr(cfg.lr, cfg.gamma, cfg.steplr)
    shuffle_fn = None
    if cfg.devices > 1:
        from plastic_unet_tpu.parallel import make_dp_epoch_fn, make_mesh, shard_stream
        from plastic_unet_tpu.parallel.dp import make_shard_shuffle_fn

        mesh = make_mesh(cfg.devices)
        if jax.process_count() > 1:
            # multi-host: each process stages only its slice of the stream
            from plastic_unet_tpu.parallel.multihost import process_local_slice, stage_global_stream

            sl = process_local_slice(X.shape[0])
            Xl, Yl = stage_global_stream(
                np.asarray(X)[sl], np.asarray(Y)[sl], mesh, lanes_per_device=cfg.lanes
            )
        else:
            Xl, Yl = shard_stream(X, Y, mesh, lanes_per_device=cfg.lanes)
        epoch_fn = make_dp_epoch_fn(model, tx, mesh, loss_space=cfg.loss_space, trace_mode=cfg.trace_mode)
        if cfg.shuffle:
            # shard-local: a global permutation would reshard the full epoch
            shuffle_fn = make_shard_shuffle_fn(mesh)
    else:
        Xl, Yl = reshape_stream(X, Y, cfg.lanes)
        epoch_fn = make_epoch_fn(model, tx, loss_space=cfg.loss_space, lanes=cfg.lanes, donate=True)
    # one recorded loss per step (in lane mode each step covers all lanes
    # and records their mean; at lanes=1/devices=1 this is the reference's
    # one-loss-per-sample bookkeeping)
    samples_count = Xl.shape[0]

    # stage validation once (NHWC on device) instead of per validation pass
    xv = jnp.asarray(np.transpose(np.asarray(x_val, np.float32), (0, 2, 3, 1)))
    yv = jnp.asarray(np.asarray(y_val, np.float32))

    all_losses: list[float] = []
    val_train_losses: list[float] = []
    val_test_losses: list[float] = []
    val_accuracies: list[float] = []
    loss_between_saves = 0.0
    last_save_epoch = 0
    if cfg.rng_impl == "threefry":
        base_rng = jax.random.PRNGKey(cfg.seed)
    else:
        base_rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    aug_rng = jax.random.PRNGKey(cfg.seed + 1)

    # Multi-epoch dispatch (PERF.md roadmap #3): fold up to
    # cfg.epochs_per_dispatch epochs into one jitted scan. Chunks never run
    # past a validation/save/rollout boundary, so the state seen by eval/
    # checkpoint code is identical to the per-epoch path; the per-epoch key
    # derivation order is replicated exactly (tests/test_multi_epoch.py pins
    # bit-identical losses+params vs epochs_per_dispatch=1).
    use_chunks = cfg.epochs_per_dispatch > 1
    if use_chunks and cfg.devices > 1:
        # DP variant (round 3): the whole K-epoch chunk — shard-local
        # shuffle, augmentation, trace re-zeros, per-step psum'd updates —
        # runs inside ONE shard_map dispatch; bit-identical to K per-epoch
        # DP dispatches (tests/test_multi_epoch.py::test_dp_chunks_*).
        from plastic_unet_tpu.parallel.dp import make_dp_multi_epoch_fn

        multi_epoch_fn = make_dp_multi_epoch_fn(
            model, tx, mesh, loss_space=cfg.loss_space, trace_mode=cfg.trace_mode,
            shuffle=cfg.shuffle, augment=cfg.augment,
        )
    elif use_chunks:
        from plastic_unet_tpu.train.loop import make_multi_epoch_fn

        multi_epoch_fn = make_multi_epoch_fn(
            model, tx, loss_space=cfg.loss_space, shuffle=cfg.shuffle, augment=cfg.augment
        )

    def _chunk_epochs(e: int) -> int:
        return chunk_epochs(
            e, cfg.epochs, cfg.epochs_per_dispatch, (cfg.val_every, cfg.save_every, cfg.rollout)
        )

    try:
        epoch = 0
        while epoch < cfg.epochs:
            k_epochs = _chunk_epochs(epoch) if use_chunks else 1
            if cfg.debug:
                print("Starting epoch %d/%d." % (epoch + 1, cfg.epochs))
            epoch_start_time = time.time()

            if k_epochs == 1:
                Xe, Ye = Xl, Yl
                if cfg.shuffle:
                    base_rng, kperm = jax.random.split(base_rng)
                    if shuffle_fn is not None:
                        Xe, Ye = shuffle_fn(Xe, Ye, kperm)
                    else:
                        flatX = Xe.reshape((-1,) + Xe.shape[2:])
                        flatY = Ye.reshape((-1,) + Ye.shape[2:])
                        perm = jax.random.permutation(kperm, flatX.shape[0])
                        Xe = flatX[perm].reshape(Xe.shape)
                        Ye = flatY[perm].reshape(Ye.shape)
                if cfg.augment:
                    aug_rng, k = jax.random.split(aug_rng)
                    shp_x, shp_y = Xe.shape, Ye.shape
                    Xa, Ya = augment_stream(k, Xe.reshape((-1,) + Xe.shape[2:]), Ye.reshape((-1,) + Ye.shape[2:]))
                    Xe = Xa.reshape(shp_x)
                    Ye = Ya.reshape(shp_y)

                # fresh trace per epoch (train.py:88); scan the whole stream
                state = state._replace(hebb=jnp.zeros_like(state.hebb))
                state, losses = epoch_fn(state, Xe, Ye, jax.random.fold_in(base_rng, epoch))
                losses_rows = np.asarray(losses, dtype=np.float64)[None]
            else:
                # precompute the K per-epoch keys in the exact order the
                # k_epochs=1 path derives them (split-then-fold per epoch)
                erngs, pkeys, akeys = [], [], []
                for j in range(k_epochs):
                    kperm = base_rng
                    if cfg.shuffle:
                        base_rng, kperm = jax.random.split(base_rng)
                    kaug = aug_rng
                    if cfg.augment:
                        aug_rng, kaug = jax.random.split(aug_rng)
                    erngs.append(jax.random.fold_in(base_rng, epoch + j))
                    pkeys.append(kperm)
                    akeys.append(kaug)
                state, losses = multi_epoch_fn(
                    state, Xl, Yl, jnp.stack(erngs), jnp.stack(pkeys), jnp.stack(akeys)
                )
                losses_rows = np.asarray(losses, dtype=np.float64)

            if not np.all(np.isfinite(losses_rows)):
                # failure detection (new capability): save state before dying.
                # Truncate at the first non-finite epoch row so the NAN_ABORT
                # artifact matches what the per-epoch path would have written
                # (later chunk epochs never "happened" from the loop's view).
                bad_row = int(np.argmax(~np.isfinite(losses_rows).all(axis=1)))
                all_losses.extend(losses_rows[: bad_row + 1].reshape(-1).tolist())
                save_reference_artifacts(
                    os.path.join(cfg.out_dir, "NAN_ABORT"),
                    state.params, cfg.as_run_params(stop_time),
                    all_losses, val_train_losses, val_test_losses, val_accuracies,
                    name_map=name_map_for(cfg),
                )
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch + bad_row} "
                    f"(dispatch chunk starting at epoch {epoch}, row {bad_row}); "
                    "state saved to NAN_ABORT_*"
                )

            epoch_time = (time.time() - epoch_start_time) / k_epochs
            for row in losses_rows:
                all_losses.extend(row.tolist())
                if cfg.quirk_epoch_loss:
                    # train.py:115 quirk: indexes ONE element (missing ':')
                    epoch_loss = float(np.mean(all_losses[-samples_count]))
                else:
                    epoch_loss = float(np.mean(all_losses[-samples_count:]))
                loss_between_saves += epoch_loss

            epoch += k_epochs - 1  # bookkeeping below sees the chunk's last epoch
            # Predictive stop (train.py:118-122): estimate when the NEXT
            # dispatch would finish. With chunking the next dispatch spans a
            # whole chunk, so scale the per-epoch average by its length —
            # otherwise stop_time can be overshot by up to K-1 epochs.
            next_k = _chunk_epochs(epoch + 1) if (use_chunks and epoch + 1 < cfg.epochs) else 1
            next_epoch_finish_time = epoch_time * next_k + time.time()
            terminate_training = (
                stop_time > 0 and next_epoch_finish_time >= stop_time
            ) or (epoch + 1) == cfg.epochs

            if cfg.debug:
                print(
                    "Epoch finished! Loss: %f, time spent: %d, terminate due to time limits: %s"
                    % (epoch_loss, epoch_time, terminate_training)
                )

            if (epoch + 1) % cfg.val_every == 0 or terminate_training:
                val_acc, val_loss = eval_net(model, state.params, xv, yv)
                val_train_losses.append(epoch_loss)
                val_test_losses.append(val_loss)
                val_accuracies.append(val_acc)
                if cfg.debug:
                    print("Validation accuracy: %f, loss: %f" % (val_acc, val_loss))
                    if "eta" in state.params:
                        print("Eta:", np.asarray(state.params["eta"]))
                    sys.stdout.flush()

            if (epoch + 1) % cfg.save_every == 0 or terminate_training:
                if cfg.debug:
                    print("Saving checkpoint files for epoch:", epoch)
                epochs_since_last_cp = max(epoch - last_save_epoch, 1)
                last_save_epoch = epoch
                if cfg.debug:
                    print(
                        "Average loss over the last %d epochs: %f"
                        % (epochs_since_last_cp, loss_between_saves / epochs_since_last_cp)
                    )
                if epoch > 100:
                    # train.py:167-170 — the reference indexes a SINGLE element
                    # (missing ':'), so "average over 100 epochs" is really the
                    # loss of one sample 100 epochs back; reproduced under the
                    # same quirk flag as the epoch-loss bug (train.py:115).
                    if cfg.quirk_epoch_loss:
                        loss_last_100 = float(np.mean(all_losses[-samples_count * 100]))
                    else:
                        loss_last_100 = float(np.mean(all_losses[-samples_count * 100 :]))
                    if cfg.debug:
                        print("Average loss over the last 100 epochs: ", loss_last_100)
                loss_between_saves = 0.0

                local_prefix = os.path.join(cfg.out_dir, "train")
                if (epoch + 1) % cfg.rollout == 0 and not terminate_training:
                    local_prefix = local_prefix + "_" + str(epoch + 1)
                save_reference_artifacts(
                    local_prefix,
                    state.params,
                    cfg.as_run_params(stop_time),
                    all_losses,
                    val_train_losses,
                    val_test_losses,
                    val_accuracies,
                    name_map=name_map_for(cfg),
                )
                orbax_save(os.path.join(cfg.out_dir, "orbax_state"), state)

            if terminate_training:
                if stop_time > 0 and next_epoch_finish_time >= stop_time:
                    print("Training terminated due to the time limits!")
                    print("Current epoch %d, train loss: %s" % (epoch, epoch_loss))
                    print(
                        "Stop time limit: %d, estimated time of next epoch end: %d"
                        % (stop_time, next_epoch_finish_time)
                    )
                break
            epoch += 1
    except KeyboardInterrupt:
        save_reference_artifacts(
            os.path.join(cfg.out_dir, "INTERRUPTED"),
            state.params,
            cfg.as_run_params(stop_time),
            all_losses,
            val_train_losses,
            val_test_losses,
            val_accuracies,
            name_map=name_map_for(cfg),
        )
        print("Saved interrupt")
        raise

    return TrainResult(state, all_losses, val_train_losses, val_test_losses, val_accuracies, model)


class _sigterm_as_interrupt:
    """Route SIGTERM through the KeyboardInterrupt save path (extension: the
    reference only traps ^C, train.py:306-312 — cloud schedulers preempt
    with SIGTERM, which would otherwise lose the run). No-op when not on the
    main thread (signal.signal raises ValueError there)."""

    def __enter__(self):
        import signal

        def raise_interrupt(signum, frame):
            raise KeyboardInterrupt

        self._prev = None
        try:
            self._prev = signal.signal(signal.SIGTERM, raise_interrupt)
        except ValueError:
            pass
        return self

    def __exit__(self, *exc):
        import signal

        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
        return False


def start_train(x_train, x_valid, y_train, y_valid, cfg: TrainConfig) -> TrainResult:
    """Create/initialize (or resume) the model and run training
    (reference start_train, train.py:213-314)."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    stop_time = cfg.stop_time

    with matmul_precision(cfg.matmul_precision):
        model = build_model(cfg)
        tx = adam_step_lr(cfg.lr, cfg.gamma, cfg.steplr)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(cfg.seed),
            (cfg.im_height, cfg.im_width, cfg.im_chan),
            lanes=cfg.lanes * cfg.devices,
        )
        if cfg.devices > 1:
            # shard the per-lane trace over the data mesh; params replicated
            from plastic_unet_tpu.parallel import dp_state_sharding, make_mesh

            rep, lane = dp_state_sharding(make_mesh(cfg.devices))
            state = state._replace(
                params=jax.device_put(state.params, rep),
                opt_state=jax.device_put(state.opt_state, rep),
                hebb=jax.device_put(state.hebb, lane),
            )

        if cfg.resume_orbax:
            from plastic_unet_tpu.train.checkpoint import orbax_restore

            state = orbax_restore(cfg.resume_orbax, jax.tree.map(lambda a: a, state))
            print("TrainState restored from %s (step %d)" % (cfg.resume_orbax, int(state.step)))
        elif cfg.load:
            from plastic_unet_tpu.utils.torch_interop import load_pth, state_dict_to_flax_params

            params = state_dict_to_flax_params(load_pth(cfg.model_path), name_map_for(cfg))
            state = state._replace(params=params, opt_state=tx.init(params))
            print("Model loaded from %s" % cfg.model_path)

        with _sigterm_as_interrupt():
            return train(model, state, x_train, x_valid, y_train, y_valid, cfg, stop_time=stop_time)
