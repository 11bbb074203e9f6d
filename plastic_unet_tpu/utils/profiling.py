"""Tracing / profiling utilities (SURVEY.md §5 'tracing' TPU equivalents).

The reference's only instrumentation is coarse per-epoch wall-clock timing
for its stop-time estimate (train.py:85,118) plus stdout prints. Here:
  * EpochTimer — the same wall-clock bookkeeping as a reusable object
    (elapsed, predicted next-epoch finish, budget check)
  * trace() — context manager around jax.profiler.TraceAnnotation so epochs/
    phases show up named in TPU profiles
  * profile_to() — capture a full XLA/TPU profile for a code region
    (viewable in TensorBoard / xprof)
"""

from __future__ import annotations

import contextlib
import time


class EpochTimer:
    """Wall-clock budget bookkeeping (reference train.py:85,118-122).

    The stop decision is *predictive*: training terminates when the estimated
    end of the NEXT epoch (last epoch's duration + now) would exceed the
    budget."""

    def __init__(self, max_train_time: float = -1):
        self.stop_time = time.time() + max_train_time if max_train_time > 0 else -1.0
        self.epoch_start = time.time()
        self.last_epoch_time = 0.0

    def start_epoch(self) -> None:
        self.epoch_start = time.time()

    def end_epoch(self) -> float:
        self.last_epoch_time = time.time() - self.epoch_start
        return self.last_epoch_time

    @property
    def next_epoch_finish_time(self) -> float:
        return self.last_epoch_time + time.time()

    def should_stop(self) -> bool:
        return self.stop_time > 0 and self.next_epoch_finish_time >= self.stop_time


@contextlib.contextmanager
def trace(name: str, **kwargs):
    """Named trace annotation visible in TPU profiles; no-op off-profile."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name, **kwargs):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture an XLA profile of the enclosed region into log_dir."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step host-side timing accumulator for throughput reporting."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def images_per_sec(self, images_per_step: int) -> float:
        return images_per_step / self.mean if self.mean else 0.0
