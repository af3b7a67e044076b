"""Multi-host tiling coordination.

The reference is strictly single-process (SURVEY.md §2.5: its "distributed
backend" is a thread scheduler); scaling past one host is new, first-class
functionality here. The design (SURVEY.md §2.5 TPU-native communication
plan / §7 multi-host):

  1. **File assignment** (DCN-level metadata only): every host reads all
     file headers (cheap) and takes a deterministic, size-balanced subset
     of the input files — the ReadCommand queue generalized across hosts.
  2. **Global bounds**: each host unions its local file bounds; the global
     cubic root bounds come from an all-reduce over the mesh (min/max per
     axis) so every host tiles against identical root bounds (required for
     identical Morton keys).
  3. **Octree ownership**: start nodes (the FAST strategy's fixed level)
     are partitioned over hosts by contiguous Morton blocks — the same
     scheme the device all_to_all step uses per chip
     (ops.device.make_sharded_encode_sort). Each host tiles only the start
     nodes it owns; batches are encoded+sorted locally and points routed
     to owners (over ICI within a slice; host boundaries exchange via the
     jax distributed runtime).
  4. **Ancestor reconstruction**: after all hosts finalize their subtrees,
     host 0 reconstructs the shared ancestors above the start level from
     the persisted children (identical to single-host finalize, since
     persistence is a shared filesystem).

This module implements the deterministic planning layer (1-3) — pure
functions testable in a single process — and `all_reduce_bounds` which
uses jax collectives when a multi-process runtime is initialized and
degrades to the local value otherwise.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.aabb import AABB


@dataclasses.dataclass
class MultiHostPlan:
    process_index: int
    process_count: int
    local_files: list
    global_bounds_cubic: AABB
    # (start_key_lo, start_key_hi) of level-`start_level` node keys owned
    # by this host (contiguous Morton block partition)
    start_level: int
    owned_node_range: tuple


def assign_files(files_with_counts, process_index: int,
                 process_count: int) -> list:
    """Deterministic size-balanced file assignment: greedy largest-first
    onto the least-loaded host (every host computes the same plan)."""
    order = sorted(files_with_counts, key=lambda fc: (-fc[1], fc[0]))
    loads = [0] * process_count
    mine = []
    for path, count in order:
        target = int(np.argmin(loads))
        loads[target] += count
        if target == process_index:
            mine.append(path)
    return mine


def owned_node_block(process_index: int, process_count: int,
                     start_level: int) -> tuple:
    """Contiguous Morton block of level-`start_level` node keys owned by
    this host (mirrors the per-device level-3 cell blocks of
    ops.device.make_sharded_encode_sort)."""
    total = 8 ** start_level
    lo = (total * process_index) // process_count
    hi = (total * (process_index + 1)) // process_count
    return lo, hi


def all_reduce_bounds(local_bounds: AABB) -> AABB:
    """Global bounds union across processes (psum-style all-reduce when a
    jax distributed runtime is up; identity for a single process)."""
    try:
        import jax

        if jax.process_count() > 1:
            import jax.numpy as jnp
            from jax.experimental.multihost_utils import (
                process_allgather)

            gathered = process_allgather(
                jnp.asarray(np.concatenate([local_bounds.min,
                                            local_bounds.max])))
            mins = np.asarray(gathered)[:, :3].min(axis=0)
            maxs = np.asarray(gathered)[:, 3:].max(axis=0)
            return AABB(mins, maxs)
    except Exception:
        pass
    return AABB(local_bounds.min, local_bounds.max)


def plan_multihost_tiling(files_with_counts, local_bounds: AABB,
                          start_level: int = 3,
                          process_index: int | None = None,
                          process_count: int | None = None) -> MultiHostPlan:
    """Build this host's deterministic share of a multi-host tiling run."""
    if process_index is None or process_count is None:
        try:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1

    bounds = all_reduce_bounds(local_bounds).cubic()
    return MultiHostPlan(
        process_index=process_index,
        process_count=process_count,
        local_files=assign_files(files_with_counts, process_index,
                                 process_count),
        global_bounds_cubic=bounds,
        start_level=start_level,
        owned_node_range=owned_node_block(process_index, process_count,
                                          start_level),
    )
