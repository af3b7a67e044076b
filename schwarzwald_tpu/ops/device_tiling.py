"""Level-synchronous octree point selection on device (the flagship kernel).

Computes, in ONE jitted XLA program over the Morton-sorted key array, the
complete octree assignment of a fresh batch under RANDOM_GRID sampling:
for every point, the octree level of the node that keeps it. This replaces
the reference's recursive per-node task graph (do_tiling_for_node,
TilingAlgorithms.cpp:499-561) with 22 data-parallel level sweeps — the
"batched per-level passes" design of SURVEY.md §7 — with exact semantics:

  - take-all when a node's point count <= max_points_per_node
    (SamplingBehaviour::TakeAllWhenCountBelowMaxPoints, Sampling.h:170-181)
  - otherwise first-remaining-point per candidate-level grid cell
    (RandomSortedGridSampling, Sampling.h:187-308), candidate level from
    the float32 log2 rule (Sampling.h:223-229)
  - terminal nodes at min(20, max_depth) keep everything
    (tile_terminal_node, TilingAlgorithms.cpp:206-241)
  - the cand == -1 "take the first point" root case (Sampling.h:290-295)
  - levels whose candidate level exceeds the 21-level Morton capacity
    (the reference's re-rooting case, TilingAlgorithms.cpp:444-483) are
    left unassigned (level 0 in the output) for the host engine to finish.

Keys are (hi, lo) uint32 pairs; cells never need more than pairwise
prefix comparisons and segment ids, so everything is 32-bit integer ops —
bit-exact on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import sampling

MAX_LEVELS = 21


def candidate_levels(root_extent_x: float, spacing_at_root: float,
                     max_depth: int):
    """Per-node-level candidate grid level (static, computed on host).
    Index i corresponds to node level i-1 (root = -1)."""
    out = []
    for node_level in range(-1, min(MAX_LEVELS - 1, max_depth) + 1):
        spacing = sampling.spacing_at_node_level(spacing_at_root, node_level)
        out.append(sampling.candidate_level_in_octree(root_extent_x, spacing))
    return out


def _first_in_cell(hi, lo, groups: int):
    """Mask: point starts a new cell whose id is the top `groups` octant
    digits (a node AT level l has l+1 digits). groups <= 0 -> root.
    lo may be None (hi-only upload) as long as the cell id fits the hi
    word (3*groups <= 31) — callers gate on that."""
    n = hi.shape[0]
    first = jnp.zeros(n, dtype=bool).at[0].set(True)
    if groups <= 0:
        return first
    bits = 3 * groups
    if bits <= 31:
        s = 31 - bits
        diff = (hi >> s)[1:] != (hi >> s)[:-1]
    else:
        s = 63 - bits  # bits from the lo word: lo >> s (s in [0,31])
        diff = (hi[1:] != hi[:-1]) | ((lo >> s)[1:] != (lo >> s)[:-1])
    return first.at[1:].set(diff)


def _segment_fields(first, remaining, iota):
    """Per-point helpers for the cell segmentation defined by `first`:
    returns (cell_start_index, remaining_before_in_cell, remaining_in_cell).

    Scatter-free: cells are CONTIGUOUS runs of the Morton-sorted order,
    so per-cell totals come from prefix sums gathered at the cell's
    first/last element — scatters (`.at[].add`) serialize on the TPU and
    dominated the sweep's runtime (round-4 profile: ~1.8 s per 4M-point
    level set; the scan+gather form is ~100x cheaper)."""
    n = first.shape[0]
    cell_start = jax.lax.cummax(jnp.where(first, iota, 0))
    csum_r = jnp.cumsum(remaining.astype(jnp.int32))
    r_before_cell = csum_r[cell_start] - remaining[cell_start].astype(jnp.int32)
    before_in_cell = csum_r - remaining.astype(jnp.int32) - r_before_cell
    # index of my cell's LAST element: nearest following segment boundary
    last = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    cell_end = jax.lax.cummin(jnp.where(last, iota, n - 1), reverse=True)
    in_cell = csum_r[cell_end] - r_before_cell
    return cell_start, before_in_cell, in_cell


def _segment_min(first, values):
    """Per-point min over the point's contiguous segment (cells are runs
    of the sorted order). Two segmented associative scans (forward from
    segment starts, backward from segment ends) — log-depth on TPU,
    replacing the serializing `.at[cell_id].min` scatter."""
    from jax import lax

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    fwd, _ = lax.associative_scan(op, (values, first))
    last = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    bwd_r, _ = lax.associative_scan(op, (values[::-1], last[::-1]))
    return jnp.minimum(fwd, bwd_r[::-1])


def _key_axis_bit(hi, lo, descent_level: int, axis: int):
    """Bit of the given axis (0=x,1=y,2=z) at octant-descent level t: key
    bit 3*(20-t) + (2-axis), from the (hi, lo) pair."""
    pos = 3 * (20 - descent_level) + (2 - axis)
    if pos >= 32:
        return (hi >> (pos - 32)) & jnp.uint32(1)
    return (lo >> pos) & jnp.uint32(1)


def _cell_centers(hi, lo, depth: int, root_min, root_max):
    """Per-point center of its depth-`depth` cell, by the same iterative
    octant halving as the host (ops/indexing.bounds_from_prefixes /
    get_octant_bounds): FP-exact on backends with true f64."""
    n = hi.shape[0]
    mins = [jnp.full(n, root_min[a], jnp.float64) for a in range(3)]
    maxs = [jnp.full(n, root_max[a], jnp.float64) for a in range(3)]
    for t in range(depth):
        for a in range(3):
            half = (maxs[a] - mins[a]) / 2
            bit = _key_axis_bit(hi, lo, t, a).astype(jnp.float64)
            mins[a] = mins[a] + bit * half
            maxs[a] = mins[a] + half
    return [mins[a] + (maxs[a] - mins[a]) / 2 for a in range(3)]


def jittered_static_config(root_extent_x: float, spacing_at_root: float,
                           node_level: int):
    """Static per-level JITTERED grid config, or None when unsupported
    (grid < 16 cells raises in the reference; grid level >= 21 re-roots).
    Mirrors JitteredSampling's setup (Sampling.h:620-693) with the node
    extent computed as root_extent / 2^(level+1) (as
    required_morton_index_depth does, Sampling.cpp:48-59); per-node ulp
    differences from the exact bounds descent are possible at pow2
    boundaries."""
    import math

    spacing = sampling.spacing_at_node_level(spacing_at_root, node_level)
    node_extent_x = root_extent_x / math.pow(2, node_level + 1)
    actual = sampling._prev_power_of_two(int(node_extent_x / spacing))
    if actual < 16:
        return None
    levels = int(math.log2(actual))
    grid_level = node_level + levels
    if grid_level >= MAX_LEVELS:
        return None
    from .permutations import (NUM_PERMUTATIONS, PERMUTATIONS_16,
                               PERMUTATIONS_32, PERMUTATIONS_64)

    start = (3 * (node_level + 1)) % NUM_PERMUTATIONS
    table = (PERMUTATIONS_16 if actual <= 16
             else PERMUTATIONS_32 if actual <= 32 else PERMUTATIONS_64)
    perms = (tuple(int(v) for v in table[start]),
             tuple(int(v) for v in table[(start + 1) % NUM_PERMUTATIONS]),
             tuple(int(v) for v in table[(start + 2) % NUM_PERMUTATIONS]))
    return {"levels": levels, "grid_level": grid_level,
            "actual": actual, "plen": min(actual, 64), "perms": perms}


def _grid_coords_of_cell(hi, lo, node_level: int, levels: int):
    """Per-point (gx, gy, gz) of its jitter-grid cell relative to its node:
    the `levels` octant digits below the node, de-interleaved
    (OctreeNodeIndex::to_grid_index semantics)."""
    n = hi.shape[0]
    gx = jnp.zeros(n, jnp.int32)
    gy = jnp.zeros(n, jnp.int32)
    gz = jnp.zeros(n, jnp.int32)
    for j in range(levels):
        t = node_level + 1 + j  # absolute descent level of this digit
        shift = levels - 1 - j
        gx = gx | (_key_axis_bit(hi, lo, t, 0).astype(jnp.int32) << shift)
        gy = gy | (_key_axis_bit(hi, lo, t, 1).astype(jnp.int32) << shift)
        gz = gz | (_key_axis_bit(hi, lo, t, 2).astype(jnp.int32) << shift)
    return gx, gy, gz


def _pick_jittered(hi, lo, positions, node_level: int, cfg, remaining, iota,
                   root_min, root_max):
    """JITTERED selection (Sampling.h:695-753): per jitter-grid cell, the
    remaining point closest to the permutation-table target point."""
    levels = cfg["levels"]
    grid_level = cfg["grid_level"]
    nmins, nmaxs = _node_min_max(hi, lo, node_level + 1, root_min, root_max)
    node_extent_x = nmaxs[0] - nmins[0]
    grid_cell_size = node_extent_x / cfg["actual"]
    permutation_cell_size = grid_cell_size / cfg["actual"]
    gx, gy, gz = _grid_coords_of_cell(hi, lo, node_level, levels)
    p0 = jnp.asarray(cfg["perms"][0], jnp.int32)
    p1 = jnp.asarray(cfg["perms"][1], jnp.int32)
    p2 = jnp.asarray(cfg["perms"][2], jnp.int32)
    plen = cfg["plen"]
    px = (p0[(gy + gz) % plen] - 1).astype(jnp.float64)
    py = (p1[(gx + gz) % plen] - 1).astype(jnp.float64)
    pz = (p2[(gx + gy) % plen] - 1).astype(jnp.float64)
    tx = nmins[0] + (gx.astype(jnp.float64) * grid_cell_size
                     + px * permutation_cell_size)
    ty = nmins[1] + (gy.astype(jnp.float64) * grid_cell_size
                     + py * permutation_cell_size)
    tz = nmins[2] + (gz.astype(jnp.float64) * grid_cell_size
                     + pz * permutation_cell_size)
    d = ((positions[:, 0] - tx) ** 2 + (positions[:, 1] - ty) ** 2
         + (positions[:, 2] - tz) ** 2)
    cell_first = _first_in_cell(hi, lo, grid_level + 1)
    masked = jnp.where(remaining, d, jnp.inf)
    is_min = remaining & (masked == _segment_min(cell_first, masked))
    _, before_eq, _ = _segment_fields(cell_first, is_min, iota)
    return is_min & (before_eq == 0)


def _node_min_max(hi, lo, depth: int, root_min, root_max):
    """Per-point min/max of its depth-`depth` node, iterative halving."""
    n = hi.shape[0]
    mins = [jnp.full(n, root_min[a], jnp.float64) for a in range(3)]
    maxs = [jnp.full(n, root_max[a], jnp.float64) for a in range(3)]
    for t in range(depth):
        for a in range(3):
            half = (maxs[a] - mins[a]) / 2
            bit = _key_axis_bit(hi, lo, t, a).astype(jnp.float64)
            mins[a] = mins[a] + bit * half
            maxs[a] = mins[a] + half
    return mins, maxs


def _pick_grid_center(hi, lo, positions, cand: int, remaining, iota,
                      root_min, root_max):
    """GRID_CENTER selection: remaining point closest to its cand-cell
    center, first on ties (GridCenterSampling, Sampling.h:314-416)."""
    cx, cy, cz = _cell_centers(hi, lo, cand + 1, root_min, root_max)
    d = ((positions[:, 0] - cx) ** 2 + (positions[:, 1] - cy) ** 2
         + (positions[:, 2] - cz) ** 2)
    cand_first = _first_in_cell(hi, lo, cand + 1)
    masked = jnp.where(remaining, d, jnp.inf)
    is_min = remaining & (masked == _segment_min(cand_first, masked))
    _, before_eq, _ = _segment_fields(cand_first, is_min, iota)
    return is_min & (before_eq == 0)


@functools.partial(jax.jit, static_argnames=("cands", "max_points",
                                             "max_depth", "strategy",
                                             "jit_cfgs", "min_node_level"))
def octree_select_grid(hi, lo, cands: tuple, max_points: int,
                       max_depth: int, strategy: str = "RANDOM_GRID",
                       positions=None, root_min=None, root_max=None,
                       jit_cfgs: tuple = None, min_node_level: int = -1,
                       n_valid=None):
    """Per-point octree assignment level for a Morton-sorted FRESH batch
    under RANDOM_GRID, GRID_CENTER or JITTERED sampling. (Revisited
    subtrees — merges with persisted caches — are owned by the native
    host sweep: the round-5 retirement note in tiling/engine.py has the
    measurements.)

    Returns int8 levels: 0 = unassigned (host fallback), otherwise
    node_level + 2 (so root -1 -> 1). GRID_CENTER/JITTERED need positions
    + root bounds (and JITTERED the static per-level configs from
    jittered_static_configs); on TPU their f64 distances use the emulated
    f64 (exact on the cpu backend, see ARCHITECTURE.md).

    min_node_level: selection starts at this node level — the FAST
    strategy's fixed start-node level (each start node's subtree is tiled
    independently from that level down, TilingAlgorithms.cpp:1314-1351);
    -1 starts at the root (ACCURATE semantics).
    """
    n = hi.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # n_valid (traced scalar): number of real leading points — the
    # power-of-two padding tail must not join node counts or grid cells.
    remaining = (jnp.ones(n, dtype=bool) if n_valid is None
                 else iota < jnp.asarray(n_valid, jnp.int32))
    out = jnp.zeros(n, dtype=jnp.int8)
    max_level = min(MAX_LEVELS - 1, max_depth)

    for node_level in range(min_node_level, max_level + 1):
        if strategy == "JITTERED":
            cfg = jit_cfgs[node_level + 1]
            cand = None
            is_terminal = node_level >= max_level
            if not is_terminal and cfg is None:
                break  # <16 grid (reference raises) or >=21 grid level
        else:
            cfg = None
            cand = cands[node_level + 1]
            requires_deeper = cand > node_level
            is_terminal = (node_level >= max_level if requires_deeper
                           else cand >= max_level)
            if not is_terminal and cand >= MAX_LEVELS:
                break  # re-rooting territory: host engine finishes these
        if lo is None:
            # hi-only upload (4 B/pt instead of 8): stop at the first
            # level whose cell ids need bits from the lo word. Points
            # still remaining there stay unassigned (level 0), which is
            # exactly the existing host-fallback rule — common shallow
            # configs never reach it, and the halved transfer pays on
            # bandwidth-priced tunnels.
            needed = max(node_level + 1,
                         0 if cand is None else cand + 1)
            if 3 * needed > 31:
                break

        participating = remaining

        if is_terminal:
            selected = participating
            out = jnp.where(selected, jnp.int8(node_level + 2), out)
            remaining = remaining & ~selected
            break

        def level_body(args, node_level=node_level, cand=cand, cfg=cfg,
                       participating=participating):
            remaining, out = args
            node_first = _first_in_cell(hi, lo, node_level + 1)
            _, before_node, in_node = _segment_fields(node_first,
                                                      participating, iota)
            take_all = in_node <= max_points

            if strategy == "JITTERED":
                pick = _pick_jittered(hi, lo, positions, node_level,
                                      dict(zip(("levels", "grid_level",
                                                "actual", "plen", "perms"),
                                               cfg)),
                                      participating, iota, root_min,
                                      root_max)
            elif cand == -1:
                pick = participating & (before_node == 0)
            elif strategy == "GRID_CENTER":
                pick = _pick_grid_center(hi, lo, positions, cand,
                                         participating, iota, root_min,
                                         root_max)
            else:
                pick_first = _first_in_cell(hi, lo, cand + 1)
                _, before_cand, _ = _segment_fields(pick_first,
                                                    participating, iota)
                pick = participating & (before_cand == 0)
            selected = jnp.where(take_all, participating, pick)
            out = jnp.where(selected, jnp.int8(node_level + 2), out)
            remaining = remaining & ~selected
            return remaining, out

        # SHORT-CIRCUIT (TPU perf): once every point is assigned, the
        # remaining (statically unrolled) level sweeps are identities —
        # uniform clouds consume everything within the first few levels,
        # and skipping the rest cuts the program's runtime severalfold.
        remaining, out = jax.lax.cond(
            jnp.any(participating), level_body, lambda args: args,
            (remaining, out))
    return out


def jittered_static_configs(root_extent_x: float, spacing_at_root: float,
                            max_depth: int) -> tuple:
    """Hashable per-level JITTERED configs for octree_select_grid."""
    out = []
    for node_level in range(-1, min(MAX_LEVELS - 1, max_depth) + 1):
        cfg = jittered_static_config(root_extent_x, spacing_at_root,
                                     node_level)
        out.append(None if cfg is None else
                   (cfg["levels"], cfg["grid_level"], cfg["actual"],
                    cfg["plen"], cfg["perms"]))
    return tuple(out)


def octree_select_random_grid(hi, lo, cands: tuple, max_points: int,
                              max_depth: int):
    return octree_select_grid(hi, lo, cands, max_points, max_depth,
                              strategy="RANDOM_GRID")


def _key_axis_bit_dyn(hi, lo, t, axis: int):
    """_key_axis_bit with a TRACED descent level t. The hi/lo word choice
    becomes a where(); shifts are clamped so both branches are defined.
    Performs the identical extraction for any concrete t, so results are
    bit-identical to the static helper."""
    pos = 3 * (20 - t) + (2 - axis)
    hi_bit = (hi >> jnp.clip(pos - 32, 0, 31).astype(jnp.uint32)) \
        & jnp.uint32(1)
    if lo is None:
        return hi_bit
    lo_bit = (lo >> jnp.clip(pos, 0, 31).astype(jnp.uint32)) & jnp.uint32(1)
    return jnp.where(pos >= 32, hi_bit, lo_bit)


def _node_min_max_dyn(hi, lo, depth, root_min, root_max,
                      max_steps: int = MAX_LEVELS):
    """_node_min_max with a TRACED depth: the halving loop unrolls to the
    static bound and steps t >= depth keep the previous value. Active
    steps perform the exact same FP operations in the same order as the
    static helper, so the surviving values are bit-identical."""
    n = hi.shape[0]
    mins = [jnp.full(n, root_min[a], jnp.float64) for a in range(3)]
    maxs = [jnp.full(n, root_max[a], jnp.float64) for a in range(3)]
    for t in range(max_steps):
        active = t < depth
        for a in range(3):
            half = (maxs[a] - mins[a]) / 2
            bit = _key_axis_bit_dyn(hi, lo, jnp.int32(t), a).astype(
                jnp.float64)
            new_min = mins[a] + bit * half
            new_max = new_min + half
            mins[a] = jnp.where(active, new_min, mins[a])
            maxs[a] = jnp.where(active, new_max, maxs[a])
    return mins, maxs


def _cell_centers_dyn(hi, lo, depth, root_min, root_max):
    mins, maxs = _node_min_max_dyn(hi, lo, depth, root_min, root_max)
    return [mins[a] + (maxs[a] - mins[a]) / 2 for a in range(3)]


def _pick_grid_center_dyn(hi, lo, positions, cand, remaining, iota,
                          root_min, root_max):
    """_pick_grid_center with a TRACED candidate level."""
    cx, cy, cz = _cell_centers_dyn(hi, lo, cand + 1, root_min, root_max)
    d = ((positions[:, 0] - cx) ** 2 + (positions[:, 1] - cy) ** 2
         + (positions[:, 2] - cz) ** 2)
    cand_first = _first_in_cell_dyn(hi, lo, cand + 1)
    masked = jnp.where(remaining, d, jnp.inf)
    is_min = remaining & (masked == _segment_min(cand_first, masked))
    _, before_eq, _ = _segment_fields(cand_first, is_min, iota)
    return is_min & (before_eq == 0)


# JITTERED grids use at most 64 cells per axis -> at most 6 octant digits
# below the node.
_JITTER_MAX_SUBLEVELS = 6


def _grid_coords_of_cell_dyn(hi, lo, node_level, levels):
    """_grid_coords_of_cell with TRACED node_level and levels."""
    n = hi.shape[0]
    gx = jnp.zeros(n, jnp.int32)
    gy = jnp.zeros(n, jnp.int32)
    gz = jnp.zeros(n, jnp.int32)
    for j in range(_JITTER_MAX_SUBLEVELS):
        active = j < levels
        t = node_level + 1 + j
        shift = jnp.maximum(levels - 1 - j, 0)
        bx = _key_axis_bit_dyn(hi, lo, t, 0).astype(jnp.int32) << shift
        by = _key_axis_bit_dyn(hi, lo, t, 1).astype(jnp.int32) << shift
        bz = _key_axis_bit_dyn(hi, lo, t, 2).astype(jnp.int32) << shift
        gx = jnp.where(active, gx | bx, gx)
        gy = jnp.where(active, gy | by, gy)
        gz = jnp.where(active, gz | bz, gz)
    return gx, gy, gz


def _pick_jittered_dyn(hi, lo, positions, node_level, cfg_row, perms_row,
                       remaining, iota, root_min, root_max):
    """_pick_jittered with traced node_level and per-level config row
    (cfg_row = [levels, grid_level, actual, plen] int32, perms_row =
    (3, 64) int32 permutation tables padded to length 64)."""
    levels, grid_level, actual, plen = (cfg_row[0], cfg_row[1], cfg_row[2],
                                        cfg_row[3])
    nmins, nmaxs = _node_min_max_dyn(hi, lo, node_level + 1, root_min,
                                     root_max)
    node_extent_x = nmaxs[0] - nmins[0]
    grid_cell_size = node_extent_x / actual.astype(jnp.float64)
    permutation_cell_size = grid_cell_size / actual.astype(jnp.float64)
    gx, gy, gz = _grid_coords_of_cell_dyn(hi, lo, node_level, levels)
    px = (perms_row[0][(gy + gz) % plen] - 1).astype(jnp.float64)
    py = (perms_row[1][(gx + gz) % plen] - 1).astype(jnp.float64)
    pz = (perms_row[2][(gx + gy) % plen] - 1).astype(jnp.float64)
    tx = nmins[0] + (gx.astype(jnp.float64) * grid_cell_size
                     + px * permutation_cell_size)
    ty = nmins[1] + (gy.astype(jnp.float64) * grid_cell_size
                     + py * permutation_cell_size)
    tz = nmins[2] + (gz.astype(jnp.float64) * grid_cell_size
                     + pz * permutation_cell_size)
    d = ((positions[:, 0] - tx) ** 2 + (positions[:, 1] - ty) ** 2
         + (positions[:, 2] - tz) ** 2)
    cell_first = _first_in_cell_dyn(hi, lo, grid_level + 1)
    masked = jnp.where(remaining, d, jnp.inf)
    is_min = remaining & (masked == _segment_min(cell_first, masked))
    _, before_eq, _ = _segment_fields(cell_first, is_min, iota)
    return is_min & (before_eq == 0)


def _first_in_cell_dyn(hi, lo, groups):
    """_first_in_cell with a TRACED group count (while-loop sweep body).
    Shifts are clamped so every branch is well-defined; groups <= 0 (the
    root cell) yields the single-segment mask like the static version."""
    n = hi.shape[0]
    bits = 3 * groups
    s1 = jnp.maximum(31 - bits, 0).astype(jnp.uint32)
    hi_key = hi >> s1
    diff = hi_key[1:] != hi_key[:-1]
    if lo is not None:
        s2 = jnp.clip(63 - bits, 0, 31).astype(jnp.uint32)
        lo_key = lo >> s2
        deep = (hi[1:] != hi[:-1]) | (lo_key[1:] != lo_key[:-1])
        diff = jnp.where(bits > 31, deep, diff)
    diff = diff & (bits > 0)  # root: one cell spanning the whole array
    first = jnp.zeros(n, dtype=bool).at[0].set(True)
    return first.at[1:].set(diff)


def _grid_level_plan(strategy: str, cands: tuple, jit_cfgs: tuple,
                     max_depth: int, min_node_level: int, hi_only: bool):
    """Static per-level plan for the while-loop sweep, all three grid
    strategies. Mirrors octree_select_grid's unrolled control flow:
    returns (node_levels, cand_levels, cfg_rows, terminal_level) where
    cand_levels is () for JITTERED and cfg_rows is () otherwise."""
    max_level = min(MAX_LEVELS - 1, max_depth)
    node_levels, cand_levels, cfg_rows = [], [], []
    terminal_level = None
    for node_level in range(min_node_level, max_level + 1):
        if strategy == "JITTERED":
            cfg = jit_cfgs[node_level + 1]
            is_terminal = node_level >= max_level
            if not is_terminal and cfg is None:
                break  # <16 grid (reference raises) or >=21 grid level
            cand = None
        else:
            cand = cands[node_level + 1]
            requires_deeper = cand > node_level
            is_terminal = (node_level >= max_level if requires_deeper
                           else cand >= max_level)
            if not is_terminal and cand >= MAX_LEVELS:
                break  # re-rooting: host engine finishes unassigned points
        if hi_only:
            needed = max(node_level + 1,
                         0 if cand is None else cand + 1)
            if 3 * needed > 31:
                break  # lo word not shipped: host fallback from here on
        if is_terminal:
            terminal_level = node_level
            break
        node_levels.append(node_level)
        if strategy == "JITTERED":
            cfg_rows.append(cfg)
        else:
            cand_levels.append(cand)
    return (tuple(node_levels), tuple(cand_levels), tuple(cfg_rows),
            terminal_level)


@functools.partial(jax.jit, static_argnames=("cands", "max_points",
                                             "max_depth", "strategy",
                                             "jit_cfgs", "min_node_level"))
def octree_select_grid_while(hi, lo, cands: tuple, max_points: int,
                             max_depth: int, strategy: str = "RANDOM_GRID",
                             positions=None, root_min=None, root_max=None,
                             jit_cfgs: tuple = None, min_node_level: int = -1,
                             n_valid=None):
    """octree_select_grid as ONE while-loop level body — all three grid
    strategies, bit-identical output to the unrolled program (asserted by
    tests/test_device_tiling.py). Compiles 60-70x faster (the unrolled
    program statically expands ~22 level sweeps); warm exec is ~2x slower
    (traced-level geometry runs every clamped halving step). This is the
    fast-compile tier of the engine's tiered sweep mode."""
    from jax import lax

    n = hi.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    node_levels, cand_levels, cfg_rows, terminal_level = _grid_level_plan(
        strategy, cands, jit_cfgs, max_depth, min_node_level, lo is None)
    remaining0 = (jnp.ones(n, dtype=bool) if n_valid is None
                  else iota < jnp.asarray(n_valid, jnp.int32))
    out0 = jnp.zeros(n, dtype=jnp.int8)

    if node_levels:
        nl_arr = jnp.asarray(node_levels, jnp.int32)
        if strategy == "JITTERED":
            cfg_arr = jnp.asarray(
                [(c[0], c[1], c[2], c[3]) for c in cfg_rows], jnp.int32)
            perms_arr = jnp.asarray(
                [[list(p) + [0] * (64 - len(p)) for p in c[4]]
                 for c in cfg_rows], jnp.int32)
        else:
            cd_arr = jnp.asarray(cand_levels, jnp.int32)

        def body(state):
            i, remaining, out = state
            node_level = nl_arr[i]
            participating = remaining
            node_first = _first_in_cell_dyn(hi, lo, node_level + 1)
            _, before_node, in_node = _segment_fields(node_first,
                                                      participating, iota)
            take_all = in_node <= max_points
            if strategy == "JITTERED":
                pick = _pick_jittered_dyn(
                    hi, lo, positions, node_level, cfg_arr[i], perms_arr[i],
                    participating, iota, root_min, root_max)
            elif strategy == "GRID_CENTER":
                cand = cd_arr[i]
                pick_grid = _pick_grid_center_dyn(
                    hi, lo, positions, cand, participating, iota,
                    root_min, root_max)
                pick_root = participating & (before_node == 0)
                pick = jnp.where(cand < 0, pick_root, pick_grid)
            else:
                cand = cd_arr[i]
                pick_first = _first_in_cell_dyn(hi, lo,
                                                jnp.maximum(cand, 0) + 1)
                _, before_cand, _ = _segment_fields(pick_first,
                                                    participating, iota)
                pick_grid = participating & (before_cand == 0)
                pick_root = participating & (before_node == 0)
                pick = jnp.where(cand < 0, pick_root, pick_grid)
            selected = jnp.where(take_all, participating, pick)
            out = jnp.where(selected,
                            (node_level + 2).astype(jnp.int8), out)
            remaining = remaining & ~selected
            return i + 1, remaining, out

        def cond(state):
            i, remaining, out = state
            # an all-assigned batch short-circuits the remaining levels,
            # which is what makes uniform clouds cheap
            return (i < len(node_levels)) & jnp.any(remaining)

        _, remaining, out = lax.while_loop(
            cond, body, (jnp.int32(0), remaining0, out0))
    else:
        remaining, out = remaining0, out0

    if terminal_level is not None:
        out = jnp.where(remaining, jnp.int8(terminal_level + 2), out)
    return out
