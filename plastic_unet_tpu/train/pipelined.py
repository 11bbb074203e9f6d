"""Pipelined (delayed-gradient) training — a documented throughput mode.

The reference's sequential semantics (src/train.py:91-112) chain every
sample through params: sample i's forward consumes params_i =
Adam(params_{i-1}, grads_{i-1}), so forward, backward and the optimizer
step form ONE serial dependency chain per sample — at B=1 the whole chain
is latency-bound and the chip idles (PERF.md round-4 dependency-floor
analysis: the legal overlap window between step n's backward and step
n+1's forward is empty, because the forward needs the stem params first
and reverse-mode AD produces the stem grads last).

This mode relaxes that chain by EXACTLY ONE sample (classic delayed /
pipelined SGD with gradient staleness 1):

    forward_i   runs at params^(i-1)   (params with updates 0..i-2 applied)
    grads_i     are taken at the same stale params the forward used
    update_i    params^(i) = Adam(params^(i-1), grads_{i-1})

Every sample is still processed strictly in stream order and the plastic
trace chains through the forwards exactly as in the sequential loop (the
trace never enters the params chain — unet_p_res.py:115-132). What changes
is only WHERE in the params trajectory each forward/grad is evaluated:
one update late. S samples still produce exactly S Adam/StepLR updates.

Why this buys latency: inside one scan-body iteration, the NEXT sample's
forward (chunk A, reads the pre-update params from the carry) and the
PREVIOUS sample's backward + Adam (chunk B, reads carried VJP residuals)
are INDEPENDENT subgraphs, so XLA's static scheduler may interleave them —
the per-iteration critical path drops from fwd+bwd+Adam to roughly
max(fwd, bwd+Adam), bounded by real execution-unit contention (measured by
scripts/r4_b1_slack_probe.py; measured result in PERF.md either way).

Mechanics: the forward is split from its backward with `jax.vjp`, and the
VJP closure is flattened to an explicit residual pytree via
`jax.closure_convert` so the pending backward can ride the scan carry.
Exactness: the grads produced from carried residuals are bit-identical to
`jax.value_and_grad` at the same (stale) params — pinned against a pure
Python step-by-step simulation of the delayed semantics in
tests/test_pipelined.py. With a single-sample stream (S=1) the mode
degenerates to the reference-exact sequential step.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from plastic_unet_tpu.ops.losses import bce_logits, bce_probs
from plastic_unet_tpu.train.loop import TrainState


def make_pipelined_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    *,
    loss_space: str = "logits",
    donate: bool = True,
) -> Callable:
    """Build the jitted pipelined whole-epoch function.

    Signature matches make_epoch_fn: (state, X, Y, rng) -> (state, losses)
      X: (S, B, H, W, C), Y: (S, B, H, W); losses: (S,) per-sample losses
      (each evaluated at the stale-by-one params its forward used).

    Memoized like make_epoch_fn, keyed on the patch_conv gate state.
    """
    from plastic_unet_tpu.ops.patch_conv import gate_state

    return _make_pipelined_epoch_fn_cached(model, tx, loss_space, donate, gate_state())


@functools.lru_cache(maxsize=32)
def _make_pipelined_epoch_fn_cached(model, tx, loss_space, donate, _gates):
    def loss_fn(params, img, mask, hebb, drop_rng):
        out = model.apply(
            {"params": params},
            img,
            jax.lax.stop_gradient(hebb),  # detached carry (train.py:97-99)
            train=True,
            rngs={"dropout": drop_rng},
        )
        if loss_space == "probs":
            loss = bce_probs(out.activout, mask)
        else:
            loss = bce_logits(out.activ, mask)
        return loss, out.hebb

    def fwd_split(params, img, mask, hebb, drop_rng):
        """Forward only; the backward is returned as (pure_vjp, residuals).

        residuals is a flat tuple of arrays (scan-carryable); pure_vjp is a
        jaxpr-backed function of (cotangent, *residuals) -> (grads,). The
        function is structurally identical on every call with these shapes,
        so a pure_vjp from one call may be applied to residuals carried from
        another — that is exactly how the pending backward crosses scan
        iterations.
        """
        (loss, vjp_fn, new_hebb) = jax.vjp(
            lambda p: loss_fn(p, img, mask, hebb, drop_rng), params, has_aux=True
        )
        pure_vjp, residuals = jax.closure_convert(vjp_fn, jnp.ones_like(loss))
        return loss, new_hebb, tuple(residuals), pure_vjp

    def apply_update(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    def epoch(state: TrainState, X: jax.Array, Y: jax.Array, rng: jax.Array):
        # Prologue: sample 0's forward at the initial params (fills the pipe).
        drop0 = jax.random.fold_in(rng, state.step)
        loss0, hebb1, res0, pure_vjp = fwd_split(state.params, X[0], Y[0], state.hebb, drop0)
        state = state._replace(hebb=hebb1)

        def body(carry, batch):
            st, res = carry
            img, mask = batch
            # Chunk A — the NEXT sample's forward at the PRE-update params
            # (and the trace the previous forward produced). Independent of
            # chunk B, so XLA may schedule them interleaved.
            drop_rng = jax.random.fold_in(rng, st.step + 1)
            loss_n, hebb_n, res_n, vjp_b = fwd_split(st.params, img, mask, st.hebb, drop_rng)
            # Chunk B — the PENDING sample's backward + Adam/StepLR step.
            (grads,) = vjp_b(jnp.ones_like(loss_n), *res)
            new_params, new_opt = apply_update(st.params, st.opt_state, grads)
            new_st = TrainState(new_params, new_opt, hebb_n, st.step + 1)
            return (new_st, res_n), loss_n

        (state, res_last), losses_rest = jax.lax.scan(body, (state, res0), (X[1:], Y[1:]))

        # Epilogue (drain): the last sample's backward + update.
        (grads,) = pure_vjp(jnp.ones_like(loss0), *res_last)
        new_params, new_opt = apply_update(state.params, state.opt_state, grads)
        state = TrainState(new_params, new_opt, state.hebb, state.step + 1)
        return state, jnp.concatenate([loss0[None], losses_rest])

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())
