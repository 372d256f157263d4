"""Chunked streaming of long feature histories through HBM.

Adaptation holds the whole `[T, N, C]` region tensor device-resident
(engines/adapt.py) — ideal up to a few years of hourly data at padded node
counts. For longer histories (or bigger grids) this module splits the
anchor range into temporal chunks that fit a device budget; each chunk's
features are shipped once per epoch and consecutive chunks overlap by
`window + horizon` timesteps so every training window still exists exactly
once. The adaptation engine issues the next chunk's host->HBM transfer
right after dispatching the current chunk's compiled epoch (both async),
so the transfer overlaps compute up to the blocking loss fetch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec


@dataclass(frozen=True)
class Chunk:
    """One temporal slice of the feature tensor.

    anchors are LOCAL indices into the chunk's feature slice; `start` maps
    them back to global time (global_anchor = start + local_anchor).
    """

    start: int
    stop: int

    def local_anchors(self, global_anchors: np.ndarray, spec: WindowSpec):
        g = np.asarray(global_anchors)
        mine = g[(g - spec.window >= self.start) & (g + spec.horizon < self.stop)]
        return mine - self.start


def plan_chunks(
    num_timesteps: int, spec: WindowSpec, max_device_timesteps: int
) -> list[Chunk]:
    """Split [0, T) into overlapping chunks of <= max_device_timesteps.

    Overlap is window + horizon, so the union of every chunk's valid anchor
    set equals the full tensor's (each global anchor belongs to exactly one
    chunk: the first whose interior covers it).
    """
    t = num_timesteps
    need = spec.window + spec.horizon + 1
    if max_device_timesteps <= 0 or t <= max_device_timesteps:
        return [Chunk(0, t)]
    if max_device_timesteps < need:
        raise ValueError(
            f"max_device_timesteps={max_device_timesteps} cannot hold a "
            f"single window+horizon ({need})"
        )
    chunks = []
    stride = max_device_timesteps - (spec.window + spec.horizon)
    start = 0
    while True:
        stop = min(t, start + max_device_timesteps)
        if stop == t:
            # Keep every chunk the same length (one compiled shape): slide
            # the final chunk back; overlapping anchors are deduplicated by
            # assign_anchors' first-wins rule.
            chunks.append(Chunk(t - max_device_timesteps, t))
            return chunks
        chunks.append(Chunk(start, stop))
        start += stride


def assign_anchors(
    chunks: list[Chunk], global_anchors: np.ndarray, spec: WindowSpec
) -> list[np.ndarray]:
    """Partition global anchors among chunks (first eligible chunk wins)."""
    remaining = set(np.asarray(global_anchors).tolist())
    out = []
    for ch in chunks:
        local = ch.local_anchors(np.array(sorted(remaining)), spec)
        global_of_local = local + ch.start
        out.append(local)
        remaining -= set(global_of_local.tolist())
    if remaining:
        raise AssertionError(f"anchors not covered by any chunk: {sorted(remaining)[:5]}")
    return out
