"""Shared interleaved-timing harness for the benchmark probes.

The axon TPU pool's contention swings make sequential A/B timing useless —
arms must sample every time window (CLAUDE.md). Every probe follows the
same discipline: warm each arm, then round-robin the arms, timing one rep
each per round with a FORCED value fetch, and compare per-arm best.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run_interleaved(arms: dict, rounds: int, log_prefix: str) -> dict:
    """Time `arms` (name -> zero-arg callable running ONE rep, including the
    forced device->host fetch) round-robin for `rounds` rounds.

    Returns {name: {"best_ms", "median_ms", "times_ms"}}.
    """
    times: dict = {name: [] for name in arms}
    for r in range(rounds):
        for name, rep in arms.items():
            t0 = time.perf_counter()
            rep()
            times[name].append(time.perf_counter() - t0)
        print(
            f"[{log_prefix}] round {r}: "
            + " ".join(f"{n}:{ts[-1] * 1e3:.0f}ms" for n, ts in times.items()),
            file=sys.stderr,
        )
    return {
        name: {
            "best_ms": min(ts) * 1e3,
            "median_ms": float(np.median(ts) * 1e3),
            "times_ms": [round(t * 1e3, 1) for t in ts],
        }
        for name, ts in times.items()
    }
