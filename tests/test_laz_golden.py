"""Golden LAZ stream fixtures + chunk-table edge cases.

Complements tests/test_laz_primitives.py (coder-level cross-checks): here
whole compressed point streams for every supported format are pinned as
committed fixtures, so ANY byte-level drift of the codec — even a change
that keeps self-round-trips green — fails loudly, and the committed
streams keep yesterday's encodes decodable by tomorrow's decoder
(asymmetric-drift detection, ADVICE round 2).

Fixture file: tests/golden/laz_streams.npz, created on first run and
committed; delete it deliberately to re-pin after an intentional format
change.
"""
import os
import struct

import numpy as np
import pytest

from schwarzwald_tpu import native
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las, laz

from test_laz import synth_records, synth_records_ext
from test_laz_primitives import SpecEncoder, SpecIntegerCompressor

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "laz_streams.npz")
BOUNDS = AABB([0.0] * 3, [100.0] * 3)
FORMATS = [0, 1, 2, 3, 6, 7, 8]
N = 2000
CHUNK = 512  # 4 chunks: 3 full + 1 partial


def lib():
    codec = native.las_codec()
    if codec is None:
        pytest.skip("native codec unavailable")
    return codec


def _encode(codec, fmt, raw):
    rl = las.record_length_for_format(fmt)
    items = laz.items_for_point_format(fmt, rl)
    types = np.array([t for t, _, _ in items], dtype=np.uint16)
    sizes = np.array([s for _, s, _ in items], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, rl, CHUNK, types, sizes)
    return stream.copy(), types, sizes, rl


def _records(fmt):
    rng = np.random.default_rng(20260816 + fmt)
    rec = (synth_records_ext(rng, N, fmt) if fmt >= 6
           else synth_records(rng, N, fmt))
    return np.ascontiguousarray(rec).view(np.uint8).reshape(-1)


def test_golden_streams(tmp_path):
    codec = lib()
    got = {}
    for fmt in FORMATS:
        raw = _records(fmt)
        stream, types, sizes, rl = _encode(codec, fmt, raw)
        got[f"records_{fmt}"] = raw
        got[f"stream_{fmt}"] = stream
    if not os.path.exists(GOLDEN):
        np.savez_compressed(GOLDEN, **got)
        pytest.skip("golden LAZ stream fixtures created")
    want = np.load(GOLDEN)
    for fmt in FORMATS:
        raw = want[f"records_{fmt}"]
        rl = las.record_length_for_format(fmt)
        items = laz.items_for_point_format(fmt, rl)
        types = np.array([t for t, _, _ in items], dtype=np.uint16)
        sizes = np.array([s for _, s, _ in items], dtype=np.int32)
        # 1. today's encoder reproduces the committed bytes exactly
        stream = codec.laz_encode_stream(raw, rl, CHUNK, types, sizes)
        assert stream.tobytes() == want[f"stream_{fmt}"].tobytes(), \
            f"format {fmt}: encoder byte stream drifted from golden"
        # 2. today's decoder decodes the COMMITTED bytes (not its own)
        committed = want[f"stream_{fmt}"]
        back = codec.laz_decode_points(committed[8:], N, CHUNK,
                                       types, sizes, rl)
        np.testing.assert_array_equal(back, raw)


def test_chunk_table_cross_implementation():
    """The chunk table is itself arithmetic-coded (IC bits=32, ctx 1,
    pred = previous size). Build one with the spec-transcribed Python
    coder and decode it natively — including sizes above 2^31 so the
    reader's int64 offset accumulation is exercised."""
    codec = lib()
    sizes = [123, 50_000, 0xFFFF_FFFF, 0x8000_0000, 7, 0, 2_147_483_647]
    enc = SpecEncoder()
    ic = SpecIntegerCompressor(enc, 32, 2)
    for i, s in enumerate(sizes):
        pred = sizes[i - 1] if i else 0
        # the i32 view of u32 values, as the native table writer does
        to_i32 = lambda v: v - (1 << 32) if v >= (1 << 31) else v  # noqa
        ic.compress(to_i32(pred), to_i32(s), 1)
    body = enc.done()
    table = struct.pack("<II", 0, len(sizes)) + body
    got = codec.laz_read_chunk_table(
        np.frombuffer(table, dtype=np.uint8), 32)
    np.testing.assert_array_equal(got, np.array(sizes, dtype=np.uint32))
    # offsets accumulate in int64 without wrapping (the reader's
    # _ensure_chunk_table path)
    starts = np.zeros(got.size, dtype=np.int64)
    np.cumsum(got[:-1], out=starts[1:])
    assert starts[-1] == sum(sizes[:-1]) > 2**31


@pytest.mark.parametrize("fmt", [1, 6])
def test_point_count_exact_multiple_of_chunk_size(tmp_path, rng, fmt):
    """count % chunk_size == 0: no partial last chunk; the chunk table
    and decode ranges must agree (classic off-by-one breeding ground)."""
    codec = lib()
    n = CHUNK * 3
    rng2 = np.random.default_rng(5)
    rec = (synth_records_ext(rng2, n, fmt) if fmt >= 6
           else synth_records(rng2, n, fmt))
    raw = np.ascontiguousarray(rec).view(np.uint8).reshape(-1)
    stream, types, sizes, rl = _encode(codec, fmt, raw)
    table_off = struct.unpack("<q", stream[:8].tobytes())[0]
    chunk_sizes = codec.laz_read_chunk_table(stream[table_off:], 100)
    assert chunk_sizes.size == 3  # not 4
    back = codec.laz_decode_points(stream[8:], n, CHUNK, types, sizes, rl)
    np.testing.assert_array_equal(back, raw)


def test_single_point_laz_file(tmp_path):
    """A one-point .laz end-to-end through the file layer."""
    buf = PointBuffer(np.array([[12.5, 42.0, 7.25]]))
    path = str(tmp_path / "one.laz")
    las.write_las(path, buf, BOUNDS, compressed=True)
    back = las.read_las(path)
    assert back.count == 1
    np.testing.assert_allclose(back.positions, buf.positions, atol=1e-3)
