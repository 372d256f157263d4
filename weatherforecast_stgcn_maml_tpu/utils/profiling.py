"""Timing spans and TPU profiler traces.

The reference instruments wall-clock with ad-hoc time.time() pairs
(train_hybrid_maml_v5.py:262-300, main.py:32-52). Here: a reusable Timer and
an optional `jax.profiler` trace context for real TPU profiles.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Timer:
    """Accumulating named span timer."""

    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> dict:
        return dict(self.spans)


@contextlib.contextmanager
def trace_span(log_dir: str | None):
    """Capture a jax.profiler trace into `log_dir` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def block_until_ready(tree):
    """Pytree-aware completion barrier (delegates to jax.block_until_ready).

    NOT sufficient for TIMING on this image: block_until_ready has been
    observed returning early through the axon tunnel (CLAUDE.md) — timed
    code must force a value fetch (np.asarray) instead. Use this only for
    warmup/synchronization."""
    import jax

    return jax.block_until_ready(tree)
