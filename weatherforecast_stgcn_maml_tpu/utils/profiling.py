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
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
