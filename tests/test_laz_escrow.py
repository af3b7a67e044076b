"""LAZ interop escrow corpus (round-4 verdict item 8).

A COMMITTED on-disk corpus of this writer's LAZ outputs — pointwise v2
(formats 0-3, compressor 2) and gated layered v3 (formats 6-8,
compressor 3), default and small chunk sizes — plus a manifest pinning
the exact bytes. Purpose: the day a laszip/lazrs-capable environment
exists, certification of true byte interop is ONE pytest run
(test_corpus_decodes_under_stock_laszip) over files produced by the
exact committed writer — no regeneration, no drift.

Until then, test_corpus_matches_manifest guards the corpus against rot:
the committed files must still decode byte-exactly to their
seed-regenerated records under our own reader, and their file hashes
must match the manifest (so any codec change that silently alters the
emitted bytes is caught and the corpus consciously regenerated via
`python -m tests.test_laz_escrow`).
"""
import hashlib
import json
import os

import numpy as np
import pytest

from schwarzwald_tpu.io import las, laz

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "golden", "laz_escrow")
MANIFEST = os.path.join(CORPUS_DIR, "manifest.json")

# (name, fmt, n, chunk_size, seed) — formats 0-3 pointwise v2, 6-8
# layered v3 (the --laz-extended-output gate's output class)
SPECS = [
    ("fmt0_default", 0, 12_000, 50_000, 1),
    ("fmt1_default", 1, 12_000, 50_000, 2),
    ("fmt2_default", 2, 12_000, 50_000, 3),
    ("fmt3_default", 3, 12_000, 50_000, 4),
    ("fmt1_chunk4k", 1, 12_000, 4_096, 5),    # multi-chunk + chunk table
    ("fmt6_default", 6, 12_000, 50_000, 6),
    ("fmt7_default", 7, 12_000, 50_000, 7),
    ("fmt8_default", 8, 12_000, 50_000, 8),
    ("fmt6_chunk4k", 6, 12_000, 4_096, 9),
]

def _records(fmt, n, seed):
    try:
        from .test_laz import synth_records, synth_records_ext
    except ImportError:  # pytest rootdir import mode (tests/ on sys.path)
        from test_laz import synth_records, synth_records_ext

    rng = np.random.default_rng(seed)
    if fmt >= 6:
        return synth_records_ext(rng, n, fmt)
    return synth_records(rng, n, fmt)


def _header(fmt, n):
    minor = 4 if fmt >= 6 else 2
    hsize = las.HEADER_SIZE_14 if minor == 4 else 227
    return las.LASHeader(
        version_minor=minor, point_data_format=fmt,
        point_record_length=las.record_length_for_format(fmt),
        point_count=n,
        scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0),
        offset_to_point_data=hsize, header_size=hsize)


def _path(name):
    return os.path.join(CORPUS_DIR, name + ".laz")


def generate_corpus():
    os.makedirs(CORPUS_DIR, exist_ok=True)
    manifest = {}
    for name, fmt, n, chunk, seed in SPECS:
        rec = _records(fmt, n, seed)
        path = _path(name)
        laz.write_laz(path, _header(fmt, n), rec, chunk_size=chunk)
        blob = open(path, "rb").read()
        manifest[name] = {
            "fmt": fmt, "n": n, "chunk_size": chunk, "seed": seed,
            "file_sha256": hashlib.sha256(blob).hexdigest(),
            "records_sha256": hashlib.sha256(
                np.ascontiguousarray(rec).view(np.uint8)).hexdigest(),
            "file_bytes": len(blob),
        }
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


@pytest.fixture(scope="module")
def manifest():
    if not os.path.exists(MANIFEST):
        pytest.fail("escrow corpus missing — run "
                    "`python -m tests.test_laz_escrow` and commit it")
    return json.load(open(MANIFEST))


@pytest.mark.parametrize("spec", SPECS, ids=[s[0] for s in SPECS])
def test_corpus_matches_manifest(manifest, spec):
    """The committed corpus file still hashes to the manifest AND decodes
    byte-exactly (under our reader) to its seed-regenerated records."""
    name, fmt, n, chunk, seed = spec
    entry = manifest[name]
    blob = open(_path(name), "rb").read()
    assert hashlib.sha256(blob).hexdigest() == entry["file_sha256"], (
        f"{name}: committed bytes drifted from manifest — if the codec "
        "changed intentionally, regenerate the corpus and recertify")
    rec = _records(fmt, n, seed)
    assert hashlib.sha256(np.ascontiguousarray(rec).view(np.uint8)
                          ).hexdigest() == entry["records_sha256"]
    f = las.LASFile(_path(name))
    assert f.header.point_data_format == fmt
    assert f.count == n
    got = laz.LAZReader(_path(name), f.header).read_records(0, n)
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.uint8).reshape(-1),
        np.ascontiguousarray(rec).view(np.uint8).reshape(-1),
        err_msg=name)


@pytest.mark.parametrize("spec", SPECS, ids=[s[0] for s in SPECS])
def test_corpus_decodes_under_stock_laszip(manifest, spec):
    """THE escrow certification: every committed corpus file must decode
    under stock LASzip (laspy's laszip/lazrs backend) with exact integer
    coordinates and attributes. Skips while no backend ships offline."""
    laspy = pytest.importorskip("laspy")
    try:
        backends = list(laspy.LazBackend.detect_available())
    except Exception:
        backends = []
    if not backends:
        pytest.skip("laspy present but no LAZ backend (laszip/lazrs)")
    name, fmt, n, chunk, seed = spec
    rec = _records(fmt, n, seed)
    theirs = laspy.read(_path(name))
    assert len(theirs.points) == n
    np.testing.assert_array_equal(np.asarray(theirs.X), rec["x"], err_msg=name)
    np.testing.assert_array_equal(np.asarray(theirs.Y), rec["y"], err_msg=name)
    np.testing.assert_array_equal(np.asarray(theirs.Z), rec["z"], err_msg=name)
    np.testing.assert_array_equal(np.asarray(theirs.intensity),
                                  rec["intensity"], err_msg=name)
    if fmt in (2, 3, 7, 8):
        for c in ("red", "green", "blue"):
            np.testing.assert_array_equal(np.asarray(getattr(theirs, c)),
                                          rec[c], err_msg=f"{name}:{c}")
    if fmt in (1, 3, 6, 7, 8):
        np.testing.assert_allclose(np.asarray(theirs.gps_time),
                                   rec["gps_time"], err_msg=name)


if __name__ == "__main__":
    m = generate_corpus()
    print(json.dumps(m, indent=1, sort_keys=True))
