"""Production multi-device (single-process, multi-chip) tiling.

The device mesh owns a static partition of the octree at a fixed start-node
level (the multi-chip analogue of the FAST strategy's fixed level,
TilingAlgorithms.cpp:1473-1535; SURVEY §2.5 TPU-native communication plan):
each batch is Morton-encoded on the host (the fused native read path),
sharded contiguously over the mesh, sorted per device, exchanged losslessly
to the owning devices (ops.device.ShardedExchange: psum'd histogram +
two-phase all_to_all that carries (key, point-id) payloads), and every
device's owned subtree is then tiled with the standard engine semantics.

Because the exchange preserves global stable key order and the ownership
blocks partition the start level exactly, a multi-device run produces an
octree byte-identical to the single-device FAST run with the same start
level — which is what tests/test_multidevice.py asserts on a virtual CPU
mesh.

Multi-host composes on top: parallel.multihost assigns input files and
ownership blocks per host; within each host this module fans out over the
local mesh.
"""
from __future__ import annotations

import numpy as np

from ..core.aabb import AABB
from ..core.pointbuffer import PointBuffer
from ..ops import indexing
from ..tiling.arena import PointArena
from ..tiling.engine import NodeTask, TilingAlgorithmFast
from ..core import morton


def make_mesh(n_devices: int | None = None, backend: str | None = None):
    """An n-device 1D mesh ('dp'), preferring the requested backend.

    Without an explicit backend, falls back to the cpu backend when the
    default one has too few devices — so `--multichip N` runs on a dev
    box with XLA's virtual cpu devices exactly as it does on an N-chip
    slice."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices(backend) if backend else jax.devices()
    if (backend is None and n_devices is not None
            and len(devices) < n_devices):
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devices = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dp",))


class TilingAlgorithmMultiDevice(TilingAlgorithmFast):
    """FAST-semantics tiling with the per-batch sort + start-level split
    executed across a device mesh.

    The start-node level doubles as the mesh ownership level; it is fixed
    up front (ownership must be static across batches), defaulting to the
    FAST estimator's MIN_LEVEL.
    """

    def __init__(self, sampling_strategy, persistence, meta,
                 progress_reporter=None, mesh=None, ownership_level: int = 3,
                 cell_range=None):
        """`cell_range=(lo, hi)` stripes only that block of level-
        `ownership_level` cells over the mesh — the multihost composition
        passes its plan's owned block so ALL local devices share the
        host's subset (the default global stripe would leave
        (hosts-1)/hosts of them idle)."""
        super().__init__(sampling_strategy, persistence, meta,
                         progress_reporter)
        from ..ops.device import ShardedExchange

        if mesh is None:
            mesh = make_mesh()
        self.mesh = mesh
        self.level_of_start_nodes = ownership_level
        self.exchange = ShardedExchange(mesh, level=ownership_level,
                                        cell_range=cell_range)

    def process_batch(self, buffer: PointBuffer, bounds: AABB) -> None:
        if not buffer.count:
            return
        keys = self.index_batch(buffer, bounds)
        arena = PointArena()
        ids = arena.append(buffer)
        self.process_sorted(arena, keys, ids, self._make_root(bounds))

    def process_sorted(self, arena, keys, ids, root) -> None:
        """Tile an already-indexed (key, arena-id) stream over the mesh —
        the entry the multi-host layer uses for its OWNED subset after
        host-level routing (keys need not be presorted; the exchange
        sorts per shard)."""
        level = self.level_of_start_nodes

        per_device, _hist = self.exchange.route(keys, ids)

        # Routing -> compute composition (round-2 verdict item 3): each
        # owner's FRESH start nodes run the grid-sampler octree sweep ON
        # THAT owner's device; sweeps are dispatched async so owner i's
        # host persistence overlaps owner i+1's selection. Revisited
        # subtrees (and sweep fallbacks) take the host merge path, exactly
        # as TilingAlgorithmFast.process_batch does per batch.
        devices = list(self.mesh.devices.flat)
        pending = []  # (device_levels, fresh_nodes, fresh_keys, fresh_ids)
        host_nodes = []
        for d, (owned_keys, owned_ids) in enumerate(per_device):
            if owned_keys.size == 0:
                continue
            shard_nodes = list(
                self._split_at_start_level(owned_keys, owned_ids, root))
            if not (self.meta.use_device and level > 0):
                host_nodes.extend(shard_nodes)
                continue
            fresh, revisit = [], []
            for sn in shard_nodes:
                (fresh if not self.persistence.node_exists(sn[0].name)
                 else revisit).append(sn)
            host_nodes.extend(revisit)
            if fresh:
                fk = np.concatenate([sn[1] for sn in fresh])
                fi = np.concatenate([sn[2] for sn in fresh])
                lv = self._device_select_levels(
                    arena, fk, fi, root, min_node_level=level - 1,
                    device=devices[d], materialize=False)
                if lv is None:
                    host_nodes.extend(fresh)
                else:
                    pending.append((lv, fresh, fk, fi))

        for lv, fresh, fk, fi in pending:
            levels = self._materialize_levels(lv)
            if levels is None:
                host_nodes.extend(fresh)
                continue
            self._persist_device_assignment(arena, fk, fi, levels, root)
            for node, _, _ in fresh:
                self._start_nodes_used.add(
                    (morton.parse_node_name(node.name)[0], level))

        self._journal_start_nodes([(n, k, i) for n, k, i in host_nodes])
        for node, k, i in host_nodes:
            if level > 0:
                self._start_nodes_used.add(
                    (morton.parse_node_name(node.name)[0], level))
            self._do_tiling_for_node(arena, NodeTask(node, root, k, i))


def dryrun(mesh, n_per_device: int = 256) -> None:
    """Exercise the full production multi-device step on tiny shapes:
    host Morton encode -> sharded sort -> lossless payload exchange ->
    per-owner split. Raises on any conservation violation."""
    n = int(mesh.devices.size) * n_per_device
    rng = np.random.default_rng(0)
    bounds = AABB(np.zeros(3), np.full(3, 64.0))
    pos = rng.uniform(0.0, 64.0, (n, 3))
    keys, _ = indexing.index_points(pos, bounds.min, bounds.max)
    ids = np.arange(n, dtype=np.int64)

    from ..ops.device import ShardedExchange

    ex = ShardedExchange(mesh, level=3)
    per_device, hist = ex.route(keys, ids)
    total = sum(k.size for k, _ in per_device)
    assert total == n, f"exchange lost points ({total}/{n})"
    assert int(hist.sum()) == n, "histogram lost points"
    seen = np.sort(np.concatenate([i for _, i in per_device]))
    assert np.array_equal(seen, ids), "exchange duplicated/lost ids"
    # ownership respected: every key landed on the device owning its block
    n_dev = int(mesh.devices.size)
    for d, (k, _) in enumerate(per_device):
        if k.size == 0:
            continue
        cells = (k >> np.uint64(63 - 9)).astype(np.int64)  # level-3 cells
        dest = (cells * n_dev) // 512
        assert (dest == d).all(), f"device {d} received foreign points"
