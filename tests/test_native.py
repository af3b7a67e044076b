"""Native kernel tests: exact agreement with the python oracles."""
import numpy as np
import pytest

from schwarzwald_tpu import native
from schwarzwald_tpu.ops import sampling


@pytest.fixture(scope="module")
def lib():
    lib = native.las_codec()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_poisson_matches_python_oracle(lib, rng):
    node_min = np.array([0.0, 0.0, 0.0])
    node_max = np.array([32.0, 32.0, 32.0])
    pos = rng.uniform(node_min, node_max, size=(5000, 3))
    for spacing in (0.5, 2.0, 7.9):
        want = sampling._poisson_accept_mask(pos, node_min, node_max, spacing)
        got = lib.poisson_accept_mask(pos, node_min, node_max, spacing)
        np.testing.assert_array_equal(got, want)


def test_poisson_with_analyze_mask(lib, rng):
    node_min = np.zeros(3)
    node_max = np.full(3, 16.0)
    pos = rng.uniform(node_min, node_max, size=(2000, 3))
    analyze = np.zeros(2000, dtype=bool)
    analyze[::4] = True
    want = sampling._poisson_accept_mask(pos, node_min, node_max, 1.0, analyze)
    got = lib.poisson_accept_mask(pos, node_min, node_max, 1.0, analyze)
    np.testing.assert_array_equal(got, want)
    assert not got[~analyze].any()


def test_poisson_degenerate_flat_extent(lib, rng):
    """Zero extent on one axis (all points coplanar) must not crash."""
    node_min = np.zeros(3)
    node_max = np.array([16.0, 16.0, 0.0])
    pos = rng.uniform(node_min, node_max, size=(500, 3))
    want = sampling._poisson_accept_mask(pos, node_min, node_max, 1.0)
    got = lib.poisson_accept_mask(pos, node_min, node_max, 1.0)
    np.testing.assert_array_equal(got, want)


def test_radix_argsort_is_stable(lib, rng):
    keys = rng.integers(0, 1 << 63, size=100_000, dtype=np.uint64)
    keys[::7] = keys[0]  # inject duplicates
    want = np.argsort(keys, kind="stable")
    got = lib.radix_argsort(keys)
    np.testing.assert_array_equal(got, want)


def test_radix_argsort_trivial_high_bytes(lib, rng):
    keys = rng.integers(0, 255, size=50_000, dtype=np.uint64)
    np.testing.assert_array_equal(lib.radix_argsort(keys),
                                  np.argsort(keys, kind="stable"))


def test_quantize_i32_matches_numpy(lib, rng):
    """Fused I32_QUANTIZE vs the numpy chain, incl. negatives and exact
    .5 boundaries (round half away from zero)."""
    pos = rng.uniform(-1000.0, 1000.0, (20_000, 3))
    pos[:64] = np.round(pos[:64] * 2) / 2  # exact halves after scaling
    scale = np.array([0.001, 0.01, 0.0001])
    offset = np.array([-3.5, 7.25, 0.0])
    v = (pos - offset) / scale
    want = np.where(v >= 0, v + 0.5, v - 0.5).astype(np.int32)
    np.testing.assert_array_equal(lib.quantize_i32(pos, scale, offset), want)


def test_arena_mapped_gather_matches_numpy(lib, rng):
    """PointArena multi-chunk gathers route through gather_rows_mapped
    (fused chunk-map locate+copy); every entry must match plain numpy
    indexing over the concatenated chunks, including chunk boundaries."""
    from schwarzwald_tpu.core.attributes import PointAttribute
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.tiling.arena import PointArena

    arena = PointArena()
    all_pos, all_rgb = [], []
    for count in (1, 700, 3, 1293, 64):
        pos = rng.uniform(0.0, 100.0, (count, 3))
        buf = PointBuffer(pos)
        buf.set_column(PointAttribute.RGB,
                       rng.integers(0, 65535, (count, 3)))
        arena.append(buf)
        all_pos.append(pos)
        # compare against what set_column actually stored (layout cast)
        all_rgb.append(buf.columns[PointAttribute.RGB])
    ref_pos = np.concatenate(all_pos)
    ref_rgb = np.concatenate(all_rgb)
    n = arena.count
    # boundary ids (first/last of each chunk) + random permutation slices
    ids = np.concatenate([
        np.array([0, n - 1], dtype=np.int64),
        np.cumsum([1, 700, 3, 1293])  # chunk starts
          .astype(np.int64),
        rng.permutation(n)[: n // 2].astype(np.int64)])
    np.testing.assert_array_equal(arena.positions(ids), ref_pos[ids])
    np.testing.assert_array_equal(arena.positions_scratch(ids), ref_pos[ids])
    out = arena.gather(ids)
    np.testing.assert_array_equal(out.positions, ref_pos[ids])
    np.testing.assert_array_equal(out.columns[PointAttribute.RGB],
                                  ref_rgb[ids])
