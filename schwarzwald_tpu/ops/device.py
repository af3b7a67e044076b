"""Device (TPU/XLA) batch pipeline: Morton encode + sort + segment stats.

The TPU-native twin of the host ops: clamping, Morton-63 encoding, key sort
and level-histogramming run as one jitted XLA program. Keys are represented
as (hi, lo) uint32 pairs throughout — TPUs have no native 64-bit integers,
so the 63-bit Morton key lives in two 32-bit lanes and `lax.sort` orders
lexicographically with `num_keys=2` (stable, with the point index as
payload).

The bit-interleave itself also exists as a Pallas TPU kernel
(`morton_interleave_pallas`) used on real TPU hardware; the jnp version is
the portable fallback and the semantic reference.

Multi-chip: `sharded_encode_sort_step` is the distributed batch step —
points are data-parallel over the mesh, each device encodes + sorts its
shard, start-node histograms are combined with psum, and points are
re-bucketed to their owning device with an all_to_all exchange keyed by the
leading Morton bits (the device axis owns a static octree partition, the
TPU analogue of the reference's fixed start-node level,
TilingAlgorithms.cpp:1473-1535).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

MAX_LEVELS = 21


def expand_bits_by_3_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 11 bits of each uint32 to every 3rd position.

    Masks are python int literals (weakly typed) so the function is usable
    inside Pallas kernels without captured-constant arrays.
    """
    v = v & 0x7FF
    v = (v | (v << 16)) & 0x070000FF
    v = (v | (v << 8)) & 0x0700F00F
    v = (v | (v << 4)) & 0x430C30C3
    v = (v | (v << 2)) & 0x49249249
    return v


def interleave21(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
    """21-bit grid coords -> 63-bit Morton key as (hi, lo) uint32 pair.

    Bit i of z/y/x goes to key position 3i+0 / 3i+1 / 3i+2 (x highest), the
    layout of calculate_morton_index (OctreeAlgorithms.h:64-87). The pair
    split is exact: lo = key bits 0..31, hi = bits 32..62.
    """
    lo = (expand_bits_by_3_u32(z & 0x7FF)
          | (expand_bits_by_3_u32(y & 0x7FF) << 1)
          | (expand_bits_by_3_u32(x & 0x3FF) << 2))
    hi = (expand_bits_by_3_u32(x >> 10)
          | (expand_bits_by_3_u32(z >> 11) << 1)
          | (expand_bits_by_3_u32(y >> 11) << 2))
    return hi, lo


def morton_interleave_pallas(x, y, z):
    """Pallas TPU kernel for the bit interleave (elementwise VPU work).

    Processes the coords in (8,128)-aligned tiles; inputs must be padded to
    a multiple of 1024 by the caller (encode_points does this).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, y_ref, z_ref, hi_ref, lo_ref):
        hi, lo = interleave21(x_ref[:], y_ref[:], z_ref[:])
        hi_ref[:] = hi
        lo_ref[:] = lo

    n = x.shape[0]
    x2 = x.reshape(-1, 128)
    shape = jax.ShapeDtypeStruct(x2.shape, jnp.uint32)
    hi, lo = pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(x2, y.reshape(-1, 128), z.reshape(-1, 128))
    return hi.reshape(n), lo.reshape(n)


def grid_coords_f64(positions, bounds_min, bounds_extent):
    """Clamp + normalize to the 2^21 grid, float64 for host-parity
    (index_point + calculate_morton_index semantics).

    CAUTION: bit-exact only on backends with true float64 (CPU). On TPU
    (v5e) the f64 emulation rounds differently for ~0.004% of points, so
    the production TPU path normalizes on the host (a cheap 3-flop/point
    pass, `ops.indexing` or the native codec) and ships u32 grid coords to
    `encode_sort_grid` — the heavy work (interleave, sort, segmentation)
    is all-integer and exact on TPU.
    """
    bounds_min = bounds_min.astype(jnp.float64)
    extent = bounds_extent.astype(jnp.float64)
    pos = jnp.clip(positions.astype(jnp.float64), bounds_min,
                   bounds_min + extent)
    scale = (2.0 ** MAX_LEVELS) / extent
    normalized = (pos - bounds_min) * scale
    bits = jnp.minimum(normalized.astype(jnp.uint32),
                       jnp.uint32(2 ** MAX_LEVELS - 1))
    return bits[:, 0], bits[:, 1], bits[:, 2], pos


def encode_points(positions, bounds_min, bounds_extent, use_pallas=False):
    """positions (N,3) -> ((hi, lo) key pair, clamped positions)."""
    x, y, z, pos = grid_coords_f64(positions, bounds_min, bounds_extent)
    if use_pallas:
        hi, lo = morton_interleave_pallas(x, y, z)
    else:
        hi, lo = interleave21(x, y, z)
    return hi, lo, pos


class SortedBatch(NamedTuple):
    key_hi: jnp.ndarray   # uint32
    key_lo: jnp.ndarray   # uint32
    order: jnp.ndarray    # int32 permutation into the input batch
    node_histogram: jnp.ndarray  # (8**level,) int32 counts at `level`


def _cells_at_level(key_hi: jnp.ndarray, level: int) -> jnp.ndarray:
    """Node prefix of `level` levels (level <= 10 -> fits in the hi word)."""
    assert 0 < level <= 10
    return key_hi >> (31 - 3 * level)


@functools.partial(jax.jit, static_argnames=("level", "use_pallas"))
def encode_sort_batch(positions, bounds_min, bounds_extent,
                      level: int = 3, use_pallas: bool = False) -> SortedBatch:
    """The device batch step: clamp + encode + stable sort + histogram.

    Replaces the reference's parallel::transform index + global std::sort
    (TilingAlgorithms.cpp:1262-1293) with one fused XLA program. Uses f64
    normalization on-device; see grid_coords_f64 for the TPU caveat.
    """
    n = positions.shape[0]
    hi, lo, _ = encode_points(positions, bounds_min, bounds_extent,
                              use_pallas=use_pallas)
    idx = jnp.arange(n, dtype=jnp.int32)
    hi_s, lo_s, order = lax.sort((hi, lo, idx), num_keys=2, is_stable=True)
    cells = _cells_at_level(hi_s, level)
    hist = jnp.zeros((8 ** level,), jnp.int32).at[cells].add(1)
    return SortedBatch(hi_s, lo_s, order, hist)


@functools.partial(jax.jit, static_argnames=("level", "use_pallas"))
def encode_sort_grid(x, y, z, level: int = 3,
                     use_pallas: bool = False) -> SortedBatch:
    """TPU production batch step: u32 grid coords (host-normalized, exact)
    -> interleave + stable sort + start-level histogram, all integer."""
    n = x.shape[0]
    if use_pallas:
        hi, lo = morton_interleave_pallas(x, y, z)
    else:
        hi, lo = interleave21(x, y, z)
    idx = jnp.arange(n, dtype=jnp.int32)
    hi_s, lo_s, order = lax.sort((hi, lo, idx), num_keys=2, is_stable=True)
    cells = _cells_at_level(hi_s, level)
    hist = jnp.zeros((8 ** level,), jnp.int32).at[cells].add(1)
    return SortedBatch(hi_s, lo_s, order, hist)


def keys_to_uint64(hi, lo):
    """Reassemble host-side uint64 keys from the device pair."""
    import numpy as np
    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) \
        | np.asarray(lo, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Multi-chip sharded batch step
# ---------------------------------------------------------------------------


def make_sharded_encode_sort(mesh, level: int = 3):
    """Builds the distributed batch step over `mesh` (axis 'dp').

    Design (SURVEY §2.5 TPU-native communication plan): each device encodes
    and sorts its local point shard; ownership of the octree's top-level
    octants is statically striped over the device axis; points travel to
    their owner via all_to_all with fixed per-destination capacity (2x
    balanced load; a production run re-estimates the partition from the
    psum'd histogram, this step exercises the real collectives on a static
    partition). Returns counts per start node (psum'd, exact) and the
    locally re-sorted owned keys (padded with sentinel keys).
    """
    import inspect

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    # jax >= 0.9 renamed check_rep -> check_vma and made args keyword-only
    _params = inspect.signature(shard_map).parameters
    _check_kw = {"check_vma": False} if "check_vma" in _params \
        else {"check_rep": False}

    n_dev = mesh.devices.size
    axis = "dp"

    def step(positions, bounds_min, bounds_extent):
        n_local = positions.shape[0]
        capacity = max(1, (2 * n_local) // n_dev)

        hi, lo, _ = encode_points(positions, bounds_min, bounds_extent)
        idx = jnp.arange(n_local, dtype=jnp.int32)
        hi, lo, idx = lax.sort((hi, lo, idx), num_keys=2, is_stable=True)

        # Exact global histogram of start-node occupancy.
        cells = _cells_at_level(hi, level)
        hist = jnp.zeros((8 ** level,), jnp.int32).at[cells].add(1)
        hist = lax.psum(hist, axis)

        # Destination device = contiguous block of level-3 cells. Block
        # partitioning keeps each destination's points contiguous in the
        # locally sorted order (Morton order), so slots are computable with
        # a prefix sum (and collectives exchange contiguous runs).
        dest = (_cells_at_level(hi, 3).astype(jnp.int32) * n_dev) // 512
        send_hi = jnp.full((n_dev, capacity), 0xFFFFFFFF, jnp.uint32)
        send_lo = jnp.full((n_dev, capacity), 0xFFFFFFFF, jnp.uint32)
        counts = jnp.zeros((n_dev,), jnp.int32).at[dest].add(1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        slot = jnp.arange(n_local, dtype=jnp.int32) - starts[dest]
        keep = slot < capacity  # overflow dropped in the dry-run step
        send_hi = send_hi.at[dest, jnp.where(keep, slot, 0)].set(
            jnp.where(keep, hi, jnp.uint32(0xFFFFFFFF)))
        send_lo = send_lo.at[dest, jnp.where(keep, slot, 0)].set(
            jnp.where(keep, lo, jnp.uint32(0xFFFFFFFF)))

        # The exchange: every device sends bucket d to device d.
        recv_hi = lax.all_to_all(send_hi, axis, 0, 0, tiled=False)
        recv_lo = lax.all_to_all(send_lo, axis, 0, 0, tiled=False)
        # Merge the received runs (sentinels sort to the end).
        merged_hi, merged_lo = lax.sort(
            (recv_hi.reshape(-1), recv_lo.reshape(-1)), num_keys=2,
            is_stable=True)
        owned = jnp.sum(merged_hi != jnp.uint32(0xFFFFFFFF),
                        dtype=jnp.int32).reshape(1)
        return hist, merged_hi, merged_lo, owned

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P(axis), P(axis), P(axis)),
        **_check_kw)
