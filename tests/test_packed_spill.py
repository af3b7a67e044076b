"""Packed spill arena (io/packed_spill.py): round trips, terminal append
order, lossy-sink parity, crash/resume atomicity, and end-to-end output
equality against the per-visit file protocol."""
import os
import threading

import numpy as np
import pytest

from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import OutputFormat, PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
from schwarzwald_tpu.io.packed_spill import PackedSpillStore

A = PointAttribute
BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def buf(rng, n, intensity=True):
    b = PointBuffer(rng.uniform(1, 99, (n, 3)))
    if intensity:
        b.set_column(A.Intensity, rng.integers(0, 65535, n, dtype=np.uint16))
    return b


def test_put_retrieve_round_trip(tmp_path, rng):
    store = PackedSpillStore(BinaryPersistence(str(tmp_path)), str(tmp_path))
    b = buf(rng, 500)
    store.persist_points(b, BOUNDS, "r04")
    assert store.node_exists("r04")
    assert not store.node_exists("r05")
    got = store.retrieve_points("r04")
    np.testing.assert_array_equal(got.positions, b.positions)
    np.testing.assert_array_equal(got.get(A.Intensity), b.get(A.Intensity))
    # replace semantics
    b2 = buf(rng, 200)
    store.persist_points(b2, BOUNDS, "r04")
    assert store.retrieve_points("r04").count == 200
    assert store.node_names() == ["r04"]


def test_append_returns_newest_extent_first(tmp_path, rng):
    """Terminal concat order: [batch_k, previous content]
    (tile_terminal_node, TilingAlgorithms.cpp:206-241)."""
    store = PackedSpillStore(BinaryPersistence(str(tmp_path)), str(tmp_path))
    b1, b2, b3 = buf(rng, 10), buf(rng, 20), buf(rng, 30)
    store.append_points(b1, BOUNDS, "r77")
    store.append_points(b2, BOUNDS, "r77")
    store.append_points(b3, BOUNDS, "r77")
    got = store.retrieve_points("r77")
    want = np.concatenate([b3.positions, b2.positions, b1.positions])
    np.testing.assert_array_equal(got.positions, want)


def test_lossy_sink_spills_quantized_content(tmp_path, rng):
    """For a lossy sink the spill stores simulate_retrieve() output, so
    re-reads during tiling equal the write-then-re-read of the wrapped
    sink (merge parity), and the drain is idempotent."""
    from schwarzwald_tpu.io.las_persistence import LASPersistence

    inner = LASPersistence(str(tmp_path))
    store = PackedSpillStore(inner, str(tmp_path))
    assert store.is_lossless is False
    b = buf(rng, 400)
    store.persist_points(b, BOUNDS, "r0")
    got = store.retrieve_points("r0")
    want = inner.simulate_retrieve(b, BOUNDS)
    np.testing.assert_array_equal(got.positions, want.positions)
    # drain writes the actual .las once; its content round-trips the same
    store.drain()
    from_disk = inner.retrieve_points("r0")
    np.testing.assert_array_equal(from_disk.positions, want.positions)


def test_drain_writes_through_and_close_removes_spill(tmp_path, rng):
    inner = BinaryPersistence(str(tmp_path))
    store = PackedSpillStore(inner, str(tmp_path))
    contents = {}
    for name in ("r", "r0", "r04", "r041"):
        b = buf(rng, 100)
        contents[name] = b.positions
        store.persist_points(b, BOUNDS, name)
    store.close()
    assert not os.path.exists(os.path.join(tmp_path, ".spill"))
    for name, pos in contents.items():
        np.testing.assert_array_equal(
            BinaryPersistence(str(tmp_path)).retrieve_points(name).positions,
            pos)


def test_uncommitted_writes_discarded_on_reopen(tmp_path, rng):
    """A crash between checkpoints: writes after the last commit_batch are
    absent after reopen (the data tail is truncated), committed ones
    survive — same contract as the staged per-file protocol."""
    inner = BinaryPersistence(str(tmp_path))
    store = PackedSpillStore(inner, str(tmp_path))
    b1, b2 = buf(rng, 300), buf(rng, 400)
    store.begin_batch()
    store.persist_points(b1, BOUNDS, "r01")
    store.append_points(buf(rng, 50), BOUNDS, "r07")
    store.commit_batch()
    # batch 2: never committed (simulated crash)
    store.begin_batch()
    store.persist_points(b2, BOUNDS, "r02")
    store.append_points(buf(rng, 60), BOUNDS, "r07")
    store._f.flush()

    reopened = PackedSpillStore(BinaryPersistence(str(tmp_path)),
                                str(tmp_path))
    assert reopened.node_exists("r01")
    assert not reopened.node_exists("r02")
    assert reopened.retrieve_points("r07").count == 50  # only batch 1's
    np.testing.assert_array_equal(reopened.retrieve_points("r01").positions,
                                  b1.positions)
    # new writes continue cleanly after the truncation
    reopened.persist_points(b2, BOUNDS, "r02")
    np.testing.assert_array_equal(reopened.retrieve_points("r02").positions,
                                  b2.positions)


def test_commit_crash_after_manifest_replays(tmp_path, rng):
    """Crash after the staging manifest is written but before the journal
    segment renames: reopen must replay the manifest (FileStaging
    recovery) and the batch counts as committed."""
    from schwarzwald_tpu.io import staging as staging_mod

    inner = BinaryPersistence(str(tmp_path))
    store = PackedSpillStore(inner, str(tmp_path))
    b1 = buf(rng, 300)
    store.begin_batch()
    store.persist_points(b1, BOUNDS, "r01")

    class Boom(RuntimeError):
        pass

    orig = staging_mod.FileStaging.commit

    def crash_after_manifest(self, extra_renames=None):
        # replicate commit up to the manifest write, then crash
        active, self._active = self._active, None
        entries = [(staged, target) for target, staged in active.items()]
        entries.extend(extra_renames or ())
        import json as _json
        tmp = self.manifest_path + ".tmp"
        os.makedirs(self.dir, exist_ok=True)
        with open(tmp, "w") as f:
            _json.dump(entries, f)
        os.replace(tmp, self.manifest_path)
        raise Boom()

    staging_mod.FileStaging.commit = crash_after_manifest
    try:
        with pytest.raises(Boom):
            store.commit_batch()
    finally:
        staging_mod.FileStaging.commit = orig

    reopened = PackedSpillStore(BinaryPersistence(str(tmp_path)),
                                str(tmp_path))
    assert reopened.node_exists("r01")
    np.testing.assert_array_equal(reopened.retrieve_points("r01").positions,
                                  b1.positions)


def test_concurrent_writers_are_serialized(tmp_path, rng):
    store = PackedSpillStore(BinaryPersistence(str(tmp_path)), str(tmp_path))
    bufs = {f"r{i}": buf(rng, 200) for i in range(8)}
    errs = []

    def write(name):
        try:
            for _ in range(5):
                store.persist_points(bufs[name], BOUNDS, name)
                store.append_points(bufs[name], BOUNDS, name + "7")
        except BaseException as e:  # surface in main thread
            errs.append(e)

    ts = [threading.Thread(target=write, args=(n,)) for n in bufs]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    for name, b in bufs.items():
        np.testing.assert_array_equal(store.retrieve_points(name).positions,
                                      b.positions)
        assert store.retrieve_points(name + "7").count == 5 * 200


def _tile(tmp_path, rng, out_name, packed, src=None, strategy="FAST",
          batch=4000):
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    if src is None:
        src = str(tmp_path / "in.las")
        b = buf(rng, 20_000)
        las.write_las(src, b, BOUNDS)
    out = tmp_path / out_name
    TilerProcess(TilerArguments(
        sources=[src], output_directory=str(out), spacing=5.0,
        max_points_per_node=600, sampling_strategy="RANDOM_GRID",
        tiling_strategy=strategy, output_format=OutputFormat.BIN,
        internal_cache_size=batch, max_batch_read_size=batch,
        packed_spill=packed, fixed_start_level=2)).run()
    sink = BinaryPersistence(str(out))
    return {n[:-4]: sink.retrieve_points(n[:-4])
            for n in os.listdir(out) if n.endswith(".bin")}


@pytest.mark.parametrize("strategy", ["FAST", "ACCURATE"])
def test_e2e_output_identical_with_and_without_spill(tmp_path, rng, strategy):
    """Multi-batch (out-of-core) run: the packed-spill output must be
    byte-identical to the per-visit file protocol's."""
    src = str(tmp_path / "in.las")
    b = buf(rng, 20_000)
    las.write_las(src, b, BOUNDS)
    spilled = _tile(tmp_path, rng, f"out_spill_{strategy}", True, src,
                    strategy)
    plain = _tile(tmp_path, rng, f"out_plain_{strategy}", False, src,
                  strategy)
    assert spilled.keys() == plain.keys()
    for name in plain:
        np.testing.assert_array_equal(spilled[name].positions,
                                      plain[name].positions,
                                      err_msg=name)
        np.testing.assert_array_equal(spilled[name].get(A.Intensity),
                                      plain[name].get(A.Intensity),
                                      err_msg=name)


def test_legacy_entries_segment_still_loads(tmp_path, rng):
    """Journal segments written before the columnar ("packed") layout use
    a positional-list "entries" array; reopen must accept both."""
    import json
    import os

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    from schwarzwald_tpu.io.packed_spill import PackedSpillStore
    import schwarzwald_tpu.io.bin_persistence as binio

    out = tmp_path / "out"
    store = PackedSpillStore(BinaryPersistence(str(out / "final")), str(out))
    buf = PointBuffer(rng.uniform(0.0, 1.0, (100, 3)))
    bounds = AABB([0.0] * 3, [1.0] * 3)
    store.begin_batch()
    store.persist_points(buf, bounds, "r0")
    store.commit_batch()
    store._f.close()
    os.close(store._read_fd)

    # rewrite the committed segment in the legacy layout
    seg = os.path.join(store.dir, "journal-000000.json")
    doc = json.load(open(seg))
    entries = [[e[0], e[1], e[2], e[3], list(e[4]), list(e[5])]
               for e in PackedSpillStore._unpack_entries(doc)]
    json.dump({"entries": entries, "data_end": doc["data_end"]},
              open(seg, "w"))

    reopened = PackedSpillStore(BinaryPersistence(str(out / "final")),
                                str(out))
    got = reopened.retrieve_points("r0")
    assert got == buf


def test_drain_and_discard_is_idempotent(tmp_path):
    """Multihost finalize drains the arena and TilerProcess.close()
    drains it again later; the second teardown must not re-close the
    same fd NUMBER (the kernel may have reused it for a live file)."""
    import numpy as np

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    from schwarzwald_tpu.io.packed_spill import PackedSpillStore

    store = PackedSpillStore(BinaryPersistence(str(tmp_path)),
                             str(tmp_path))
    bounds = AABB([0.0] * 3, [1.0] * 3)
    store.persist_points(PointBuffer(np.zeros((5, 3))), bounds, "r0")
    stolen_fd = store._read_fd
    store.drain_and_discard()
    assert store._read_fd == -1 and store._f is None
    # simulate fd reuse: open a live file that lands on the freed number
    import os
    probe = os.open(str(tmp_path / "r0.bin"), os.O_RDONLY)
    try:
        store.drain_and_discard()  # second teardown must be a no-op
        os.fstat(probe)  # still alive — would raise EBADF if re-closed
    finally:
        os.close(probe)
    assert stolen_fd >= 0  # sanity: the store really had an fd before


def test_append_over_preexisting_inner_node_keeps_prior_points(tmp_path):
    """A resumed run whose PRIOR session wrote node files WITHOUT the
    spill (e.g. it ran single-batch, or --no-packed-spill): appending a
    new batch to such a terminal node must keep the file's existing
    points — the spill store must adopt them as the oldest extent, since
    its own record otherwise shadows the inner fallback and the drain
    would overwrite the file with only the new points."""
    import numpy as np

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    from schwarzwald_tpu.io.packed_spill import PackedSpillStore

    bounds = AABB([0.0] * 3, [1.0] * 3)
    prior = PointBuffer(np.full((4, 3), 0.25))
    inner = BinaryPersistence(str(tmp_path))
    inner.persist_points(prior, bounds, "r07")  # previous session's file

    store = PackedSpillStore(BinaryPersistence(str(tmp_path)),
                             str(tmp_path))
    new = PointBuffer(np.full((3, 3), 0.75))
    store.append_points(new, bounds, "r07")

    got = store.retrieve_points("r07")
    assert got.count == 7  # newest first, prior content last
    np.testing.assert_array_equal(got.positions[:3], new.positions)
    np.testing.assert_array_equal(got.positions[3:], prior.positions)

    store.drain_and_discard()
    final = BinaryPersistence(str(tmp_path)).retrieve_points("r07")
    assert final.count == 7
    np.testing.assert_array_equal(final.positions[:3], new.positions)
    np.testing.assert_array_equal(final.positions[3:], prior.positions)
