"""Randomized differential battery: device-on vs host across sampled
configurations.

The targeted parity tests pin specific scenarios; this battery samples the
configuration space (strategy x sampler x batches x spacing x max_points x
max_depth) and asserts BYTE-identical node sets and contents between a
host-only run and a use_device="cpu" run — fresh sweeps, revisit sweeps,
take-all/AlwaysAdhere transitions, terminal nodes and fallbacks all land
wherever the sampled parameters put them. Seeded, so failures reproduce.
"""
import numpy as np
import pytest

import schwarzwald_tpu  # noqa: F401
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io.memory import MemoryPersistence
from schwarzwald_tpu.ops.sampling import SamplingStrategy
from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                    make_tiling_algorithm)

BOUNDS = AABB([0.0] * 3, [64.0] * 3)

# (strategy, sampler, n_batches, spacing, max_points, max_depth, clustered)
CASES = [
    (TilingStrategy.Fast, "RANDOM_GRID", 2, 5.0, 150, 100, False),
    (TilingStrategy.Fast, "GRID_CENTER", 2, 7.0, 250, 100, False),
    (TilingStrategy.Fast, "JITTERED", 2, 2.0, 120, 100, False),
    (TilingStrategy.Fast, "RANDOM_GRID", 3, 4.0, 80, 6, True),
    (TilingStrategy.Accurate, "RANDOM_GRID", 2, 6.0, 200, 100, True),
    (TilingStrategy.Accurate, "GRID_CENTER", 3, 5.0, 100, 5, False),
    (TilingStrategy.Accurate, "JITTERED", 2, 2.0, 300, 100, True),
    (TilingStrategy.Fast, "GRID_CENTER", 3, 9.0, 60, 100, True),
    # MIN_DISTANCE: use_device engages the per-node device Poisson
    # relaxation (ops/device_poisson) for ranges >= its gate; ACCURATE
    # roots see the full batch, so the relaxation actually runs
    (TilingStrategy.Accurate, "MIN_DISTANCE", 2, 6.0, 200, 100, False),
    (TilingStrategy.Accurate, "MIN_DISTANCE", 2, 5.0, 150, 100, True),
]


def _batches(rng, n_batches, clustered):
    out = []
    for _ in range(n_batches):
        n = int(rng.integers(3000, 8000))
        if clustered:
            centers = rng.uniform(4, 60, (5, 3))
            pos = np.clip(
                centers[rng.integers(0, 5, n)] + rng.normal(0, 3.0, (n, 3)),
                BOUNDS.min + 1e-9, BOUNDS.max - 1e-9)
        else:
            pos = rng.uniform(BOUNDS.min, BOUNDS.max, (n, 3))
        out.append(pos)
    return out


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c[0].value}-{c[1]}-b{c[2]}" for c in CASES])
def test_device_vs_host_differential(on_cpu, rng, case):
    strategy, sampler, n_batches, spacing, max_points, max_depth, clus = case
    batches = _batches(rng, n_batches, clus)

    def run(device):
        meta = TilerMetaParameters(
            spacing_at_root=spacing, max_points_per_node=max_points,
            max_depth=max_depth, concurrency=4,
            use_device="cpu" if device else None)
        sink = MemoryPersistence()
        algo = make_tiling_algorithm(strategy, SamplingStrategy(
            sampler, max_points), sink, meta)
        if hasattr(algo, "level_of_start_nodes") and \
                strategy == TilingStrategy.Fast:
            algo.level_of_start_nodes = 3
        for pos in batches:
            algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return sink

    host = run(False)
    dev = run(True)
    assert set(host.node_names()) == set(dev.node_names()), case
    for name in host.node_names():
        np.testing.assert_array_equal(
            dev.retrieve_points(name).positions,
            host.retrieve_points(name).positions,
            err_msg=f"{case}: node {name}")
