"""Optimizer: Adam + StepLR with reference-exact semantics.

The reference steps Adam *and* the StepLR scheduler once per SAMPLE
(train.py:110-112), so the decay step size is measured in samples, not
epochs (shell default --step-lr 1e5, train_model.sh:16; SURVEY.md §2.1).

torch parity details:
  * Adam(lr, betas=(0.9, 0.999), eps=1e-8) -> optax.scale_by_adam with
    eps_root=0 (bias-corrected, eps outside the sqrt) matches torch exactly.
  * StepLR(gamma, step_size): update k (0-based) uses
    lr0 * gamma**floor(k / step_size), since scheduler.step() runs *after*
    optimizer.step(). optax.scale_by_schedule consumes count-before-
    increment, which is the same k.
Verified against torch trajectories in tests/test_train_loop.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import optax


def step_lr_schedule(lr: float, gamma: float, step_size: float) -> optax.Schedule:
    """torch StepLR as an optax schedule (per-update count)."""
    step_size = max(int(step_size), 1)

    def schedule(count):
        return lr * jnp.power(gamma, jnp.floor_divide(count, step_size).astype(jnp.float32))

    return schedule


@functools.lru_cache(maxsize=32)
def adam_step_lr(
    lr: float, gamma: float = 0.666, step_size: float = 1e6, fused: bool = False
) -> optax.GradientTransformation:
    """Adam + per-step StepLR, matching reference train.py:66-68.

    fused=True wraps the transform in optax.flatten (one flat vector instead
    of ~60 leaves). Measured NEGATIVE on TPU v5e at B=1: 576 vs 677 imgs/s —
    the ravel concat + unravel slices cost more than the saved elementwise
    kernels, because the step is conv-bound, not optimizer-bound (PERF.md
    round-2 breakdown). Kept as a tested opt-in; default off.

    lru_cached: optax transforms are immutable, and returning the SAME
    instance for the same hyperparameters lets the (model, tx)-keyed epoch
    factory caches in train.loop hit — repeated start_train invocations in
    one process (hyperparameter sweeps, the e2e pipeline) then reuse traced
    jit executables instead of re-tracing (~seconds each, PERF.md round-3
    attribution)."""
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0),
        optax.scale_by_schedule(step_lr_schedule(lr, gamma, step_size)),
        optax.scale(-1.0),
    )
    return optax.flatten(tx) if fused else tx
