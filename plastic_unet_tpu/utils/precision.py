"""Matmul precision policy.

XLA's default matmul precision runs fp32 contractions through reduced
precision passes (bf16x3 on TPU MXU / reduced CPU paths) — great for
throughput, wrong for bit-level parity with the fp32 PyTorch reference.

The framework therefore has an explicit policy:
  * "parity"  -> jax.lax.Precision HIGHEST everywhere (reference-faithful
                 fp32; used by tests and the port-verification mode)
  * "perf"    -> XLA default (MXU-fast) — the production TPU setting
  * any literal jax precision string ("default", "float32", "highest",
    "bfloat16", ...) is passed through.
"""

from __future__ import annotations

import contextlib

import jax

_ALIASES = {"parity": "highest", "perf": "default", None: "default"}


@contextlib.contextmanager
def matmul_precision(policy: str | None):
    """Context manager applying the named precision policy to all dots/convs."""
    literal = _ALIASES.get(policy, policy)
    with jax.default_matmul_precision(literal):
        yield
