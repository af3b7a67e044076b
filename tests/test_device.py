"""Device pipeline tests (cpu backend mesh): pair-encoded Morton keys vs
the numpy host encoder, sorted-batch equivalence, and the sharded
multi-chip step (encode + sort + psum histogram + all_to_all exchange)."""
import os

import numpy as np
import pytest

import schwarzwald_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.ops import device, indexing

BMIN = np.array([0.0, 0.0, 0.0])
BMAX = np.array([64.0, 64.0, 64.0])


def host_grid_coords(pos):
    keys, _ = indexing.index_points(pos, BMIN, BMAX)
    return keys, morton.grid_coords(keys, 21)


def test_interleave_matches_host(on_cpu, rng):
    n = 50000
    x = rng.integers(0, 1 << 21, n).astype(np.uint32)
    y = rng.integers(0, 1 << 21, n).astype(np.uint32)
    z = rng.integers(0, 1 << 21, n).astype(np.uint32)
    oh = np.array([1 << i for i in range(21)] + [0, (1 << 21) - 1],
                  dtype=np.uint32)
    zo = np.zeros_like(oh)
    x = np.concatenate([x, oh, zo, zo])
    y = np.concatenate([y, zo, oh, zo])
    z = np.concatenate([z, zo, zo, oh])
    hi, lo = device.interleave21(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(z))
    got = device.keys_to_uint64(hi, lo)
    want = morton.from_grid_coords(x, y, z)
    np.testing.assert_array_equal(got, want)


def test_pair_encoding_matches_host_cpu(on_cpu, rng):
    pos = rng.uniform(BMIN, BMAX, size=(4096, 3))
    hi, lo, _ = device.encode_points(jnp.asarray(pos), jnp.asarray(BMIN),
                                     jnp.asarray(BMAX - BMIN))
    got = device.keys_to_uint64(hi, lo)
    want, _ = indexing.index_points(pos, BMIN, BMAX)
    np.testing.assert_array_equal(got, want)


def test_pair_encoding_edge_coordinates(on_cpu):
    pos = np.array([[0, 0, 0], [64, 64, 64], [63.9999999, 0, 64],
                    [-5, 70, 32]], dtype=np.float64)
    hi, lo, _ = device.encode_points(jnp.asarray(pos), jnp.asarray(BMIN),
                                     jnp.asarray(BMAX - BMIN))
    got = device.keys_to_uint64(hi, lo)
    want, _ = indexing.index_points(pos, BMIN, BMAX)
    np.testing.assert_array_equal(got, want)


def test_encode_sort_grid_matches_host_sort(on_cpu, rng):
    pos = rng.uniform(BMIN, BMAX, size=(10000, 3))
    want_keys, (gx, gy, gz) = host_grid_coords(pos)
    batch = device.encode_sort_grid(jnp.asarray(gx.astype(np.uint32)),
                                    jnp.asarray(gy.astype(np.uint32)),
                                    jnp.asarray(gz.astype(np.uint32)),
                                    level=3)
    got_keys = device.keys_to_uint64(batch.key_hi, batch.key_lo)
    order = indexing.sort_by_key(want_keys)
    np.testing.assert_array_equal(got_keys, want_keys[order])
    np.testing.assert_array_equal(np.asarray(batch.order), order)
    cells = morton.truncate_to_level(want_keys, 2)
    want_hist = np.bincount(cells.astype(np.int64), minlength=512)
    np.testing.assert_array_equal(np.asarray(batch.node_histogram), want_hist)


def test_sharded_step_on_virtual_mesh(cpu_devices, rng):
    # 4 devices keep the XLA-CPU compile affordable on the 1-core test
    # machine; the driver's dryrun_multichip exercises the 8-device mesh.
    from jax.sharding import Mesh

    n_dev = 4
    if len(cpu_devices) < n_dev:
        pytest.skip("need virtual cpu devices")
    mesh = Mesh(np.array(cpu_devices[:n_dev]), ("dp",))
    step = device.make_sharded_encode_sort(mesh, level=3)

    n = n_dev * 512
    pos = rng.uniform(BMIN, BMAX, size=(n, 3))
    with jax.default_device(cpu_devices[0]), mesh:
        hist, owned_hi, owned_lo, owned_counts = step(
            jnp.asarray(pos), jnp.asarray(BMIN), jnp.asarray(BMAX - BMIN))

    keys, _ = indexing.index_points(pos, BMIN, BMAX)
    cells = morton.truncate_to_level(keys, 2).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(hist),
                                  np.bincount(cells, minlength=512))
    assert int(np.asarray(owned_counts).sum()) == n
    owned_hi = np.asarray(owned_hi).reshape(n_dev, -1)
    owned_lo = np.asarray(owned_lo).reshape(n_dev, -1)
    for d in range(n_dev):
        ks = device.keys_to_uint64(owned_hi[d], owned_lo[d])
        real = ks[owned_hi[d] != 0xFFFFFFFF]
        assert (np.diff(real.astype(np.int64)) >= 0).all()
        if real.size:
            # ownership = contiguous blocks of level-3 cells
            level3 = (real >> np.uint64(63 - 9)).astype(np.int64)
            assert ((level3 * n_dev) // 512 == d).all()


def test_resolve_use_device_cache_behavior(tmp_path, monkeypatch):
    """'auto' resolution: pass-throughs, cached decisions honored, and a
    FAILED probe must not poison the cache (round-3 review)."""
    import json

    from schwarzwald_tpu.ops import device as dev

    assert dev.resolve_use_device("cpu") == "cpu"
    assert dev.resolve_use_device("tpu") == "tpu"
    assert dev.resolve_use_device(None) is None

    import time

    cache = str(tmp_path / "probe.json")

    def record(decision, threshold_s=0.002, age_s=0.0, platform=None):
        json.dump({"decision": decision, "threshold_s": threshold_s,
                   "default_platform": platform
                   if platform is not None else dev._default_platform_name(),
                   "probed_at": time.time() - age_s}, open(cache, "w"))

    record("tpu")
    assert dev.resolve_use_device("auto", cache_path=cache) == "tpu"

    # stale / mismatched cache records re-probe instead of being trusted
    # forever (ADVICE r3): force the re-probe to decide host so a hit on
    # the stale "tpu" answer is detectable.
    monkeypatch.setattr(dev, "probe_dispatch_latency",
                        lambda *a, **k: (0.030, "tpu"))
    record("tpu", age_s=25 * 3600)  # expired TTL
    assert dev.resolve_use_device("auto", cache_path=cache) is None
    record("tpu", threshold_s=0.5)  # different threshold than cached
    assert dev.resolve_use_device("auto", cache_path=cache) is None
    record("tpu", platform="interposer")  # default backend changed
    assert dev.resolve_use_device("auto", cache_path=cache) is None
    monkeypatch.undo()

    # failed probe: host for this run, cache untouched
    cache2 = str(tmp_path / "probe2.json")
    monkeypatch.setattr(dev, "probe_dispatch_latency", lambda *a, **k: None)
    assert dev.resolve_use_device("auto", cache_path=cache2) is None
    assert not os.path.exists(cache2)

    # fast local probe: decision cached
    monkeypatch.setattr(dev, "probe_dispatch_latency",
                        lambda *a, **k: (0.0005, "tpu"))
    assert dev.resolve_use_device("auto", cache_path=cache2) == "tpu"
    assert json.load(open(cache2))["decision"] == "tpu"
    # slow (tunneled) probe on a fresh cache: host
    cache3 = str(tmp_path / "probe3.json")
    monkeypatch.setattr(dev, "probe_dispatch_latency",
                        lambda *a, **k: (0.030, "tpu"))
    assert dev.resolve_use_device("auto", cache_path=cache3) is None
    assert json.load(open(cache3))["decision"] is None


def test_resolve_use_device_hang_guard(tmp_path, monkeypatch):
    """A WEDGED backend probe (tunneled client init blocking forever, not
    erroring) must not hang the production host path: resolution runs
    under a watchdog and falls back to host without caching anything."""
    import time

    from schwarzwald_tpu.ops import device as dev

    cache = str(tmp_path / "probe.json")

    def hung_probe(*a, **k):
        time.sleep(60)

    monkeypatch.setattr(dev, "probe_dispatch_latency", hung_probe)
    monkeypatch.setenv("SCHWARZWALD_PROBE_TIMEOUT_S", "0.3")
    t0 = time.perf_counter()
    assert dev.resolve_use_device("auto", cache_path=cache) is None
    assert time.perf_counter() - t0 < 5.0
    assert not os.path.exists(cache)  # timeout never poisons the cache


def test_call_with_timeout():
    import time

    from schwarzwald_tpu.ops.device import call_with_timeout

    ok, r = call_with_timeout(lambda: 42, 5.0)
    assert ok and r == 42
    ok, r = call_with_timeout(lambda: time.sleep(30), 0.2)
    assert not ok and r is None
    # exceptions inside the worker surface as (True, None), not a raise
    def boom():
        raise RuntimeError("x")
    ok, r = call_with_timeout(boom, 5.0)
    assert ok and r is None
