"""Checkpointing: reference-compatible artifacts + Orbax state.

The reference writes three artifacts per save (src/train.py:150-203):
  1. <prefix>_data.hdf5 — gzip/shuffle/fletcher32 datasets net/{w,alpha,eta},
     train/all_losses, validation/{train_losses,test_losses,accuracies}
     (train.py:178-196). The comp.-12 visualizer reads this schema, so it is
     reproduced exactly (viz compatibility).
  2. <prefix>_parameters.dat — pickled run-params dict (train.py:199-200).
  3. <prefix>_net.pth — the full state_dict (train.py:203). Written through
     utils.torch_interop so reference tooling can load our checkpoints and
     vice versa (requires torch; skipped gracefully without).

Additionally (new capability): an Orbax checkpoint of the full TrainState
(params, opt_state, hebb trace, step) enabling exact mid-training resume —
the reference can only resume model weights (train.py:293-296).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

_H5_OPTS = dict(compression="gzip", shuffle=True, fletcher32=True)


def save_reference_artifacts(
    prefix: str,
    params,
    run_params: dict,
    all_losses,
    val_train_losses,
    val_test_losses,
    val_accuracies,
    name_map=None,
) -> None:
    """Write the reference's three checkpoint artifacts at <prefix>_*."""
    import h5py

    # One packed device->host transfer for the whole tree instead of a
    # ~25-30 ms relay roundtrip per leaf (utils.transfer; measured 3.1 s ->
    # sub-second per save by scripts/r3_e2e_attribution.py).
    from plastic_unet_tpu.utils.transfer import fetch_tree_to_host

    params = fetch_tree_to_host(params)

    with h5py.File(prefix + "_data.hdf5", "w") as f:
        # net/{w,alpha,eta} exist only for plastic models; the vanilla
        # (plastic=False) extension has no head params to record.
        for key in ("w", "alpha", "eta"):
            if key in params:
                f.create_dataset(f"net/{key}", data=np.asarray(params[key]), **_H5_OPTS)
        f.create_dataset("train/all_losses", data=np.asarray(all_losses, dtype=np.float64), **_H5_OPTS)
        f.create_dataset("validation/train_losses", data=np.asarray(val_train_losses, dtype=np.float64), **_H5_OPTS)
        f.create_dataset("validation/test_losses", data=np.asarray(val_test_losses, dtype=np.float64), **_H5_OPTS)
        f.create_dataset("validation/accuracies", data=np.asarray(val_accuracies, dtype=np.float64), **_H5_OPTS)
        f.flush()

    with open(prefix + "_parameters.dat", "wb") as fo:
        pickle.dump(run_params, fo)

    if name_map is not None:
        try:
            from plastic_unet_tpu.utils.torch_interop import flax_params_to_state_dict, save_pth

            save_pth(flax_params_to_state_dict(params, name_map), prefix + "_net.pth")
        except ImportError:
            pass  # torch unavailable: .pth export skipped


def orbax_save(path: str, state) -> None:
    """Save the full TrainState (exact-resume checkpoint)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def orbax_restore(path: str, abstract_state):
    """Restore a TrainState saved by orbax_save."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)
