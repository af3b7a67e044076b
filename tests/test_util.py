"""Foundation utility tests (journal, LRU cache, units, terminal UI,
octree index writer, errors) mirroring the reference's infra tests
(TestJournal.cpp, TestLRUCache.cpp, TestUnits.cpp)."""
import json
import os

import numpy as np
import pytest

from schwarzwald_tpu.core.lru_cache import LRUCache
from schwarzwald_tpu.tiling.octree_index_writer import (
    read_octree_indices_from_file, write_octree_indices_to_file)
from schwarzwald_tpu.util.errors import (ChainedError, IgnoreErrors,
                                         chain_error, parse_ignore_errors)
from schwarzwald_tpu.util.journal import JournalStore
from schwarzwald_tpu.util.terminal_ui import render_progress_bar
from schwarzwald_tpu.util.units import format_bytes, format_metric


def test_journal_csv_single_file(tmp_path):
    store = JournalStore()
    j = store.new_journal("stats").with_record_type(
        ["iteration", "throughput"]).as_csv(str(tmp_path)) \
        .into_single_file().build()
    j.add_record([0, 1000.5])
    j.add_record([1, 2000.5])
    j.flush()
    lines = open(tmp_path / "stats.csv").read().splitlines()
    assert lines[0] == "iteration;throughput"
    assert lines[1] == "0;1000.5"
    assert store.get_journal("stats") is j


def test_journal_unique_files(tmp_path):
    store = JournalStore()
    j = store.new_journal("graphs").with_flat_type() \
        .as_text(str(tmp_path)).into_unique_files().build()
    j.add_record("digraph a {}")
    j.add_record("digraph b {}")
    assert open(tmp_path / "graphs_0.txt").read().strip() == "digraph a {}"
    assert open(tmp_path / "graphs_1.txt").read().strip() == "digraph b {}"


def test_journal_chunked(tmp_path):
    store = JournalStore()
    j = store.new_journal("chunky").with_flat_type() \
        .as_json(str(tmp_path)).into_chunked_files(2).build()
    for i in range(5):
        j.add_record(i)
    j.flush()
    files = sorted(os.listdir(tmp_path))
    assert files == ["chunky_0.json", "chunky_1.json", "chunky_2.json"]
    assert json.load(open(tmp_path / "chunky_2.json")) == [4]


def test_lru_cache_eviction_order():
    sizes = {"a": 40, "b": 40, "c": 40}
    cache = LRUCache(100, size_of=lambda v: sizes[v])
    evicted = []
    cache.add_evict_handler(lambda k, v: evicted.append(k))
    cache.put(1, "a")
    cache.put(2, "b")
    assert cache.try_get(1) == "a"  # touch 1 -> 2 becomes LRU
    cache.put(3, "c")
    assert evicted == [2]
    assert cache.try_get(2) is None
    assert cache.try_get(1) == "a" and cache.try_get(3) == "c"


def test_lru_cache_numpy_sizing():
    cache = LRUCache(1000)
    cache.put("x", np.zeros(100, dtype=np.float64))  # 800 bytes
    assert cache.used_bytes == 800
    cache.put("y", np.zeros(100, dtype=np.float64))
    assert cache.try_get("x") is None  # evicted


def test_pointbuffer_detach_base():
    """Cached node buffers must own their memory: a slice view pins its
    whole base array while the LRU accounts only the view's nbytes
    (the 100M-soak RSS blow-up mode)."""
    from schwarzwald_tpu.core.pointbuffer import PointBuffer

    base = PointBuffer(np.arange(300, dtype=np.float64).reshape(100, 3))
    from schwarzwald_tpu.core.attributes import PointAttribute
    base.set_column(PointAttribute.Intensity,
                    np.arange(100, dtype=np.uint16))
    view = base.slice(10, 20)
    assert view.positions.base is not None  # precondition: it IS a view
    owned = view.detach_base()
    assert owned.positions.base is None
    assert all(arr.base is None for arr in owned.columns.values())
    np.testing.assert_array_equal(owned.positions, view.positions)
    np.testing.assert_array_equal(
        owned.columns[PointAttribute.Intensity],
        view.columns[PointAttribute.Intensity])
    # already-owning buffers come back as-is (no copy)
    assert owned.detach_base() is owned
    # a view morton_keys alone forces the detach
    owned2 = base.copy()
    owned2.morton_keys = np.arange(200, dtype=np.uint64)[50:150]
    detached = owned2.detach_base()
    assert detached is not owned2
    assert detached.morton_keys.base is None
    np.testing.assert_array_equal(detached.morton_keys, owned2.morton_keys)


def test_units():
    assert format_bytes(800 * (1 << 20)) == "800.00 MiB"
    assert format_bytes(256 * 10 ** 6, binary=False) == "256.00 MB"
    assert format_metric(2_500_000, "pts/s") == "2.50 Mpts/s"
    assert format_bytes(12) == "12 B"


def test_progress_bar_rendering():
    assert render_progress_bar(0.0, 4) == "    "
    assert render_progress_bar(1.0, 4) == "████"
    half = render_progress_bar(0.5, 4)
    assert len(half) == 4 and half.startswith("██")


def test_octree_index_writer_roundtrip(tmp_path, rng):
    keys = rng.integers(0, 1 << 63, 1000, dtype=np.uint64)
    path = str(tmp_path / "node.idx")
    write_octree_indices_to_file(path, keys)
    np.testing.assert_array_equal(read_octree_indices_from_file(path), keys)


def test_ignore_errors_parsing():
    assert parse_ignore_errors([]) == IgnoreErrors.NONE
    combo = parse_ignore_errors(["MISSING_FILES", "CORRUPTED_FILES"])
    assert combo & IgnoreErrors.MISSING_FILES
    assert combo & IgnoreErrors.CORRUPTED_FILES
    assert not combo & IgnoreErrors.INACCESSIBLE_FILES
    allf = parse_ignore_errors(["ALL_FILE_ERRORS"])
    assert allf & IgnoreErrors.UNSUPPORTED_FILE_FORMAT
    assert not allf & IgnoreErrors.MISSING_POINT_ATTRIBUTES
    assert parse_ignore_errors(["ALL_ERRORS"]) \
        & IgnoreErrors.MISSING_POINT_ATTRIBUTES
    with pytest.raises(ValueError):
        parse_ignore_errors(["BOGUS"])


def test_chained_error_formatting():
    inner = ValueError("disk on fire")
    err = chain_error(inner, "Reading points failed")
    assert "Reading points failed" in str(err)
    assert "caused by: disk on fire" in str(err)
    assert isinstance(err, ChainedError)
