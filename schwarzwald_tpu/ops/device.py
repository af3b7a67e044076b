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


def probe_dispatch_latency(backend: str | None = None,
                           reps: int = 5) -> tuple[float, str] | None:
    """Median round-trip seconds for a tiny jitted op on the backend's
    first device, plus the platform name. None if unavailable.

    This is the measurement behind use_device='auto': on a locally
    attached TPU the dispatch round-trip is sub-millisecond; through a
    network tunnel (this deployment's axon setup) it is tens of
    milliseconds, which multiplied by the per-batch dispatch count makes
    the host path faster (ARCHITECTURE.md round-2 measurements)."""
    import time

    import numpy as np

    try:
        devs = jax.devices(backend) if backend else jax.devices()
        if not devs:
            return None
        dev = devs[0]
        f = jax.jit(lambda x: x + 1)
        with jax.default_device(dev):
            x = jnp.zeros(8, jnp.int32)
            np.asarray(f(x))  # compile + warm
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(x))
                times.append(time.perf_counter() - t0)
        return sorted(times)[reps // 2], dev.platform
    except Exception:
        return None


def _default_platform_name() -> str | None:
    """Platform of the default JAX backend, or None if unavailable."""
    try:
        return jax.default_backend()
    except Exception:
        return None


def call_with_timeout(fn, timeout_s: float, *args, **kwargs):
    """Run fn on a daemon thread; (True, result) or (False, None) after
    timeout_s. JAX backend *initialization* on tunneled-accelerator
    deployments can block indefinitely (not error) when the tunnel is
    down — a probe must never take the production host path down with
    it. The abandoned thread stays parked inside the C client init and
    dies with the process (daemon)."""
    import threading

    box: dict = {}

    def runner():
        try:
            box["r"] = fn(*args, **kwargs)
        except Exception:
            box["r"] = None

    t = threading.Thread(target=runner, daemon=True,
                         name="schwarzwald-device-probe")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return False, None
    return True, box.get("r")


def resolve_use_device(requested: str | None,
                       threshold_s: float = 0.002,
                       cache_path: str | None = "auto") -> str | None:
    """Resolve the --use-device setting to a concrete backend or None.

    'cpu'/'tpu' pass through; None stays host-only; 'auto' measures the
    default backend's dispatch latency once (cached on disk per machine,
    ~/.cache/schwarzwald_tpu/device_probe.json) and enables the device
    path only when the accelerator is local (round-trip < threshold) and
    not the cpu platform. The decision is measured data, not a hardcoded
    default (round-2 verdict item 4).

    The whole resolution (including reading the cache, whose validation
    asks the default backend's platform name) runs under a watchdog
    (SCHWARZWALD_PROBE_TIMEOUT_S, default 60 s): if backend bring-up
    hangs, the run proceeds host-only and nothing is cached."""
    if requested in ("cpu", "tpu"):
        return requested
    if requested != "auto":
        return None
    import os

    timeout_s = float(os.environ.get("SCHWARZWALD_PROBE_TIMEOUT_S", "60"))
    ok, decision = call_with_timeout(
        _resolve_auto_uncached, timeout_s, threshold_s, cache_path)
    if not ok:
        from ..util import log

        log.warn("--use-device auto: backend probe did not answer in "
                 f"{timeout_s:.0f}s (accelerator unreachable?); "
                 "continuing host-only")
        return None
    return decision


def _resolve_auto_uncached(threshold_s: float,
                           cache_path: str | None) -> str | None:
    import json
    import os

    if cache_path == "auto":
        cache_path = os.path.join(
            os.path.expanduser("~"), ".cache", "schwarzwald_tpu",
            "device_probe.json")
    if cache_path and os.path.exists(cache_path):
        try:
            import time as _time

            cached = json.load(open(cache_path))
            # The cached decision is only valid for the same question: a
            # changed threshold or a different default backend (e.g. a TPU
            # attached after a host-only probe) must re-probe, and any
            # record older than a day expires — a probe is cheap next to a
            # production run, staleness is not (ADVICE r3).
            same_threshold = cached.get("threshold_s") == threshold_s
            same_backend = cached.get("default_platform") in (
                None, _default_platform_name())
            fresh = (_time.time() - cached.get("probed_at", 0)
                     < 24 * 3600)
            if same_threshold and same_backend and fresh:
                return cached.get("decision")
        except Exception:
            pass
    probed = probe_dispatch_latency()
    if probed is None:
        # transient failure (device busy, init hiccup): fall back to host
        # for THIS run but don't poison the cache — the next run re-probes
        return None
    latency, platform = probed
    local = latency < threshold_s and platform not in ("cpu", "host")
    decision = platform if local else None
    import time as _time
    record = {"latency_s": latency, "platform": platform,
              "threshold_s": threshold_s, "decision": decision,
              "default_platform": _default_platform_name(),
              "probed_at": _time.time()}
    if cache_path:
        try:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump(record, f)
        except Exception:
            pass
    return decision


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

        # Destination device = contiguous block of level-`level` cells.
        # Block partitioning keeps each destination's points contiguous in
        # the locally sorted order (Morton order), so slots are computable
        # with a prefix sum (and collectives exchange contiguous runs).
        dest = (_cells_at_level(hi, level).astype(jnp.int32) * n_dev) \
            // (8 ** level)
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


# ---------------------------------------------------------------------------
# Production multi-device exchange: two-phase, payload-carrying, lossless
# ---------------------------------------------------------------------------


def _shard_map_compat():
    import inspect

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    params = inspect.signature(shard_map).parameters
    kw = {"check_vma": False} if "check_vma" in params else {"check_rep": False}
    return shard_map, kw


class ShardedExchange:
    """The production multi-device batch exchange (SURVEY §2.5 TPU-native
    communication plan): points travel as (key_hi, key_lo, point_id)
    triples to the device owning their octree block.

    Two phases so that NO point is ever dropped (the capacity of the
    all_to_all is data-dependent, but XLA shapes are static):

      phase 1 (`counts`):  per-device stable sort by key + exact global
          start-node histogram (psum) + per-destination send counts.
      phase 2 (`exchange`): jitted per capacity bucket (next power of two of
          the true max count, so recompiles are logarithmically bounded);
          scatters each device's contiguous destination runs into
          (n_dev, capacity) buffers, all_to_all over the mesh axis, then a
          stable merge. Equal keys keep global batch order: shards are
          contiguous batch spans, receive buffers are concatenated in
          source order, and the merge sort is stable — so the result is
          bit-identical to a single-device stable sort of the whole batch.

    Ownership: level-`level` Morton cells striped in contiguous blocks over
    the device axis — the multi-chip analogue of the FAST strategy's fixed
    start-node level (TilingAlgorithms.cpp:1473-1535). `cell_range`
    narrows the striped space to [lo, hi) cells: under multihost each
    host's mesh must stripe only the host's OWNED block, otherwise
    (count-1)/count of its local devices receive nothing on every batch
    (the host never feeds the rest of the global cell space).
    """

    SENTINEL = 0xFFFFFFFF  # valid keys have hi <= 0x7FFFFFFF (63-bit keys)

    def __init__(self, mesh, level: int = 3, cell_range=None):
        self.mesh = mesh
        self.level = level
        self.cell_range = cell_range
        self.n_dev = int(mesh.devices.size)
        # Compiled programs are shared ACROSS instances: the step
        # functions close over nothing instance-specific (only level /
        # n_dev / the sentinel), but a per-__init__ closure would give
        # jax.jit a fresh function identity and recompile the exchange
        # for every algorithm instance (~1 s per instance on the CPU
        # mesh, minutes on TPU). Keyed by (mesh, level); a process uses
        # a handful of meshes at most.
        (self._counts, self._exchange_cache,
         self._make_exchange) = _exchange_programs(mesh, level, cell_range)


    def _pad(self, arr, fill):
        import numpy as np

        n = arr.shape[0]
        per = -(-n // self.n_dev)
        total = per * self.n_dev
        if total == n:
            return arr
        return np.concatenate(
            [arr, np.full(total - n, fill, dtype=arr.dtype)])

    def route(self, keys_u64, ids):
        """Route a host batch: returns (owned_keys_u64, owned_ids) per
        device, exactly partitioned by ownership block, globally sorted
        within each device, no points dropped."""
        import numpy as np

        hi = self._pad((keys_u64 >> np.uint64(32)).astype(np.uint32),
                       self.SENTINEL)
        lo = self._pad(keys_u64.astype(np.uint32), self.SENTINEL)
        ids32 = self._pad(np.asarray(ids, dtype=np.int32), -1)

        with self.mesh:
            s_hi, s_lo, s_id, counts, hist = self._counts(hi, lo, ids32)
            max_count = int(np.asarray(counts).max())
            capacity = 1
            while capacity < max_count:
                capacity <<= 1
            exchange = self._exchange_cache.get(capacity)
            if exchange is None:
                exchange = self._make_exchange(capacity)
                self._exchange_cache[capacity] = exchange
            m_hi, m_lo, m_id, owned = exchange(s_hi, s_lo, s_id)

        m_hi = np.asarray(m_hi).reshape(self.n_dev, -1)
        m_lo = np.asarray(m_lo).reshape(self.n_dev, -1)
        m_id = np.asarray(m_id).reshape(self.n_dev, -1)
        owned = np.asarray(owned).reshape(-1)
        results = []
        for d in range(self.n_dev):
            k = int(owned[d])
            keys = (m_hi[d, :k].astype(np.uint64) << np.uint64(32)) \
                | m_lo[d, :k].astype(np.uint64)
            results.append((keys, m_id[d, :k].astype(np.int64)))
        return results, np.asarray(hist)


_EXCHANGE_PROGRAMS: dict = {}


def _exchange_programs(mesh, level: int, cell_range=None):
    """(counts_jit, per-capacity exchange cache, make_exchange) for a
    (mesh, level, cell_range) triple — memoized so every ShardedExchange
    over the same mesh reuses the same compiled executables."""
    n_cells = 8 ** level
    lo_cell, hi_cell = cell_range if cell_range is not None \
        else (0, n_cells)
    key = (mesh, level, int(lo_cell), int(hi_cell))
    cached = _EXCHANGE_PROGRAMS.get(key)
    if cached is not None:
        return cached
    from jax.sharding import PartitionSpec as P

    shard_map, check_kw = _shard_map_compat()
    n_dev = int(mesh.devices.size)
    axis = "dp"
    SENTINEL = ShardedExchange.SENTINEL
    span = int(hi_cell) - int(lo_cell)

    def _dest_of(cells):
        # contiguous blocks of the OWNED [lo, hi) cell range over the
        # device axis; clip keeps accidental foreign/padding cells
        # conserved on a boundary device (the masked adds ignore padding)
        d = ((cells.astype(jnp.int32) - lo_cell) * n_dev) // span
        return jnp.clip(d, 0, n_dev - 1)

    def counts_step(hi, lo, ids):
        hi, lo, ids = lax.sort((hi, lo, ids), num_keys=2, is_stable=True)
        valid = ids >= 0  # host padding carries id -1
        cells = _cells_at_level(hi, level)
        # padding keys are sentinels whose cell is out of range; a
        # masked add keeps them out (OOB scatter indices clip under jit)
        hist = jnp.zeros((n_cells,), jnp.int32).at[cells].add(
            valid.astype(jnp.int32))
        hist = lax.psum(hist, axis)
        dest = _dest_of(cells)
        counts = jnp.zeros((n_dev,), jnp.int32).at[dest].add(
            valid.astype(jnp.int32))
        return hi, lo, ids, counts, hist

    import jax

    # jit the shard_maps: un-jitted they run through the eager
    # _shard_map_impl with per-op dispatch (~100x slower per batch on
    # the CPU mesh); jitted, each (shape, capacity) compiles once
    counts_jit = jax.jit(shard_map(
        counts_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        **check_kw))

    exchange_cache: dict = {}

    def make_exchange(capacity: int):
        def exchange_step(hi, lo, ids):
            n_local = hi.shape[0]
            cells = _cells_at_level(hi, level)
            valid = ids >= 0
            dest = _dest_of(cells)
            counts = jnp.zeros((n_dev,), jnp.int32).at[dest].add(
                valid.astype(jnp.int32))
            starts = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(counts)[:-1].astype(jnp.int32)])
            # position within the contiguous destination run; padding
            # (invalid) entries sit at the end of the sorted order and
            # are scattered out of bounds, which mode="drop" discards
            rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
            slot = jnp.where(valid, rank - starts[dest], capacity)
            dest = jnp.where(valid, dest, 0)
            send_hi = jnp.full((n_dev, capacity), SENTINEL, jnp.uint32)
            send_lo = jnp.full((n_dev, capacity), SENTINEL, jnp.uint32)
            send_id = jnp.full((n_dev, capacity), -1, jnp.int32)
            send_hi = send_hi.at[dest, slot].set(hi, mode="drop")
            send_lo = send_lo.at[dest, slot].set(lo, mode="drop")
            send_id = send_id.at[dest, slot].set(ids, mode="drop")
            recv_hi = lax.all_to_all(send_hi, axis, 0, 0, tiled=False)
            recv_lo = lax.all_to_all(send_lo, axis, 0, 0, tiled=False)
            recv_id = lax.all_to_all(send_id, axis, 0, 0, tiled=False)
            # stable merge: receive buffers flatten in source order
            m_hi, m_lo, m_id = lax.sort(
                (recv_hi.reshape(-1), recv_lo.reshape(-1),
                 recv_id.reshape(-1)), num_keys=2, is_stable=True)
            owned = jnp.sum(m_hi != jnp.uint32(SENTINEL),
                            dtype=jnp.int32).reshape(1)
            del n_local
            return m_hi, m_lo, m_id, owned

        return jax.jit(shard_map(
            exchange_step, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            **check_kw))

    programs = (counts_jit, exchange_cache, make_exchange)
    _EXCHANGE_PROGRAMS[key] = programs
    return programs

