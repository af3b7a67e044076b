"""Checkpoint/resume tests: interrupted runs continue at batch granularity
with conserved point counts, and --journal produces throughput CSV +
chrome-trace artifacts."""
import json
import os

import numpy as np
import pytest

from schwarzwald_tpu.cli import main as cli_main
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.io.bin_persistence import BinaryPersistence

BOUNDS = AABB([0.0] * 3, [100.0] * 3)


def write_las(path, rng, n):
    las.write_las(str(path),
                  PointBuffer(rng.uniform(1, 99, (n, 3))), BOUNDS)


def test_checkpoint_written_and_cleared(tmp_path, rng):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 5000)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out), "--spacing",
                   "8", "--sampling", "RANDOM_GRID", "--output-format",
                   "BIN"])
    assert rc == 0
    # checkpoint removed after successful completion
    assert not os.path.exists(out / "tiler_state.json")


def test_resume_continues_from_checkpoint(tmp_path, rng):
    """Simulate an interrupt by running with a small internal cache and a
    poisoned second batch, then resume."""
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 9000)
    original = las.read_las(str(src)).positions

    from schwarzwald_tpu.core.attributes import OutputFormat
    from schwarzwald_tpu.process import tiler as tiler_mod
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    args = TilerArguments(
        sources=[str(src)], output_directory=str(out), spacing=8.0,
        sampling_strategy="RANDOM_GRID", tiling_strategy="ACCURATE",
        output_format=OutputFormat.BIN, internal_cache_size=3000,
        max_batch_read_size=3000,
        checkpoint_interval_s=0.0)  # per-batch: the test kills batch 3

    # Interrupt after the 2nd completed batch by raising from the read
    # stage (covers both the plain and the region-slot read paths).
    orig_plain = tiler_mod.Tiler._read_batch
    orig_region = tiler_mod.Tiler._read_batch_into_slot
    calls = {"n": 0}

    def _poison():
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated crash during batch 3 read")

    def poisoned_plain(self, rc):
        _poison()
        return orig_plain(self, rc)

    def poisoned_region(self, rc, slot):
        _poison()
        return orig_region(self, rc, slot)

    tiler_mod.Tiler._read_batch = poisoned_plain
    tiler_mod.Tiler._read_batch_into_slot = poisoned_region
    try:
        with pytest.raises(KeyboardInterrupt):
            TilerProcess(args).run()
    finally:
        tiler_mod.Tiler._read_batch = orig_plain
        tiler_mod.Tiler._read_batch_into_slot = orig_region

    state = json.load(open(out / "tiler_state.json"))
    assert 0 < state["points_processed"] < 9000

    # Resume and finish.
    args.resume = True
    TilerProcess(args).run()
    assert not os.path.exists(out / "tiler_state.json")

    sink = BinaryPersistence(str(out))
    collected = [sink.retrieve_points(f[:-4]).positions
                 for f in os.listdir(out) if f.endswith(".bin")]
    got = np.concatenate(collected)
    assert got.shape[0] == 9000  # no loss, no duplication
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  original[np.lexsort(original.T)])


def test_journal_outputs(tmp_path, rng):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 5000)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out), "--spacing",
                   "8", "--sampling", "RANDOM_GRID", "--output-format",
                   "BIN", "--journal"])
    assert rc == 0
    journal_dir = out / "journal"
    assert (journal_dir / "throughput_stats.csv").exists()
    lines = open(journal_dir / "throughput_stats.csv").read().splitlines()
    assert lines[0].startswith("iteration;read_throughput")
    assert len(lines) >= 2
    trace = json.load(open(journal_dir / "executor_trace.json"))
    names = {e["name"] for e in trace["traceEvents"]}
    assert "read_batch" in names and "index_batch" in names


def test_mid_batch_crash_does_not_duplicate_points(tmp_path, rng):
    """A crash in the MIDDLE of a batch (some nodes already persisted)
    must not duplicate that batch's points on resume: node writes are
    staged per batch and committed atomically before the checkpoint
    (io/staging.py)."""
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 9000)
    original = las.read_las(str(src)).positions

    from schwarzwald_tpu.core.attributes import OutputFormat
    from schwarzwald_tpu.io import bin_persistence
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    # the per-file staging protocol under test is bypassed by the packed
    # spill arena (which has its own crash tests in test_packed_spill.py)
    args = TilerArguments(
        sources=[str(src)], output_directory=str(out), spacing=8.0,
        sampling_strategy="RANDOM_GRID", tiling_strategy="ACCURATE",
        output_format=OutputFormat.BIN, internal_cache_size=3000,
        max_batch_read_size=3000, packed_spill=False)

    class Boom(RuntimeError):
        pass

    # crash after the 3rd node write of the 2nd batch
    orig_persist = bin_persistence.BinaryPersistence.persist_points
    state = {"batch": 0, "writes": 0}
    orig_begin = bin_persistence.BinaryPersistence.begin_batch

    def begin(self):
        state["batch"] += 1
        state["writes"] = 0
        orig_begin(self)

    def persist(self, points, bounds, node_name):
        if state["batch"] == 2:
            state["writes"] += 1
            if state["writes"] > 3:
                raise Boom()
        orig_persist(self, points, bounds, node_name)

    bin_persistence.BinaryPersistence.begin_batch = begin
    bin_persistence.BinaryPersistence.persist_points = persist
    try:
        with pytest.raises(Boom):
            TilerProcess(args).run()
    finally:
        bin_persistence.BinaryPersistence.begin_batch = orig_begin
        bin_persistence.BinaryPersistence.persist_points = orig_persist

    # checkpoint says batch 1 done; batch 2's partial writes were staged,
    # never committed
    assert os.path.exists(out / "tiler_state.json")
    state_doc = json.load(open(out / "tiler_state.json"))
    assert state_doc["points_processed"] == 3000

    args.resume = True
    TilerProcess(args).run()

    sink = BinaryPersistence(str(out))
    collected = [sink.retrieve_points(f[:-4]).positions
                 for f in os.listdir(out) if f.endswith(".bin")]
    got = np.concatenate(collected)
    assert got.shape[0] == 9000  # exactly once: no duplicates, no losses
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  original[np.lexsort(original.T)])
    assert not os.path.exists(out / ".staging" / "MANIFEST.json")


def test_crash_during_commit_replays_checkpoint_atomically(tmp_path, rng):
    """The window the round-2 advisor flagged: a crash AFTER the staging
    manifest is written but BEFORE the renames run. The checkpoint rename
    rides in the same manifest as the node renames, so recovery must
    replay BOTH — the resumed run sees batch 2 as committed and never
    re-tiles it."""
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 9000)
    original = las.read_las(str(src)).positions

    from schwarzwald_tpu.core.attributes import OutputFormat
    from schwarzwald_tpu.io import staging as staging_mod
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    # the per-file staging protocol under test is bypassed by the packed
    # spill arena (which has its own crash tests in test_packed_spill.py)
    args = TilerArguments(
        sources=[str(src)], output_directory=str(out), spacing=8.0,
        sampling_strategy="RANDOM_GRID", tiling_strategy="ACCURATE",
        output_format=OutputFormat.BIN, internal_cache_size=3000,
        max_batch_read_size=3000, packed_spill=False)

    class Boom(RuntimeError):
        pass

    orig_commit = staging_mod.FileStaging.commit
    calls = {"n": 0}

    def commit_crash_after_manifest(self, extra_renames=None):
        calls["n"] += 1
        if calls["n"] == 2:
            # real logic up to (and including) the manifest write, then die
            active, self._active = self._active, None
            entries = [(s, t) for t, s in active.items()]
            entries.extend(extra_renames or ())
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entries, f)
            os.replace(tmp, self.manifest_path)
            raise Boom()
        orig_commit(self, extra_renames)

    staging_mod.FileStaging.commit = commit_crash_after_manifest
    try:
        with pytest.raises(Boom):
            TilerProcess(args).run()
    finally:
        staging_mod.FileStaging.commit = orig_commit

    # The crash happened before the checkpoint rename ran: the durable
    # checkpoint still says 3000 (batch 1), the manifest holds batch 2.
    assert json.load(open(out / "tiler_state.json"))[
        "points_processed"] == 3000
    assert os.path.exists(out / ".staging" / "MANIFEST.json")

    args.resume = True
    TilerProcess(args).run()

    sink = BinaryPersistence(str(out))
    collected = [sink.retrieve_points(f[:-4]).positions
                 for f in os.listdir(out) if f.endswith(".bin")]
    got = np.concatenate(collected)
    assert got.shape[0] == 9000  # batch 2 replayed from manifest, not re-tiled
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  original[np.lexsort(original.T)])


def test_staging_distinguishes_same_basename_targets(tmp_path):
    """path_for must not collide two targets that share a basename, and
    re-staging the same target within one batch must dedupe to a single
    manifest entry (ADVICE round 2)."""
    from schwarzwald_tpu.io.staging import FileStaging

    work = tmp_path / "w"
    (work / "a").mkdir(parents=True)
    (work / "b").mkdir()
    st = FileStaging(str(work))
    st.begin()
    pa = st.path_for(str(work / "a" / "n.bin"))
    pb = st.path_for(str(work / "b" / "n.bin"))
    assert pa != pb
    open(pa, "w").write("A")
    open(pb, "w").write("B")
    # same target staged twice -> same staged path, last write wins
    pa2 = st.path_for(str(work / "a" / "n.bin"))
    assert pa2 == pa
    open(pa2, "w").write("A2")
    st.commit()
    assert open(work / "a" / "n.bin").read() == "A2"
    assert open(work / "b" / "n.bin").read() == "B"


def test_deferred_checkpoint_crash_restarts_clean(tmp_path, rng):
    """With a deferred-commit window wider than the run (packed spill),
    a crash before the first commit leaves NO checkpoint; --resume then
    restarts from scratch over the same output directory (uncommitted
    spill bytes are truncated on reopen) and produces a complete,
    loss-free output."""
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_las(src, rng, 9000)
    original = las.read_las(str(src)).positions

    from schwarzwald_tpu.core.attributes import OutputFormat
    from schwarzwald_tpu.process import tiler as tiler_mod
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    args = TilerArguments(
        sources=[str(src)], output_directory=str(out), spacing=8.0,
        sampling_strategy="RANDOM_GRID", tiling_strategy="ACCURATE",
        output_format=OutputFormat.BIN, internal_cache_size=3000,
        max_batch_read_size=3000,
        checkpoint_interval_s=1e9)  # never due within the test

    orig_plain = tiler_mod.Tiler._read_batch
    orig_region = tiler_mod.Tiler._read_batch_into_slot
    calls = {"n": 0}

    def _poison():
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated crash during batch 3 read")

    def poisoned_plain(self, rc):
        _poison()
        return orig_plain(self, rc)

    def poisoned_region(self, rc, slot):
        _poison()
        return orig_region(self, rc, slot)

    tiler_mod.Tiler._read_batch = poisoned_plain
    tiler_mod.Tiler._read_batch_into_slot = poisoned_region
    try:
        with pytest.raises(KeyboardInterrupt):
            TilerProcess(args).run()
    finally:
        tiler_mod.Tiler._read_batch = orig_plain
        tiler_mod.Tiler._read_batch_into_slot = orig_region

    # no commit was due, so no checkpoint exists
    assert not os.path.exists(out / "tiler_state.json")

    args.resume = True
    TilerProcess(args).run()
    assert not os.path.exists(out / "tiler_state.json")

    sink = BinaryPersistence(str(out))
    collected = [sink.retrieve_points(f[:-4]).positions
                 for f in os.listdir(out) if f.endswith(".bin")]
    got = np.concatenate(collected)
    assert got.shape[0] == 9000  # no loss, no duplication
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  original[np.lexsort(original.T)])
