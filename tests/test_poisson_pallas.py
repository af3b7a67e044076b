"""Pallas MIN_DISTANCE kernel (ops/poisson_pallas) vs the f32 greedy oracle.

The kernel's contract is bit-exact equality with a sequential greedy pass
in float32 arithmetic (reference semantics: accept iff no earlier ACCEPTED
point strictly within `spacing` — Sampling.h:444-465). These tests run the
kernel in interpreter mode (the CPU test env has no TPU); the same kernel
ran bit-identically against this oracle on real v5e hardware (see
ARCHITECTURE.md round-5 findings).
"""
import numpy as np
import pytest

from schwarzwald_tpu.ops import indexing
from schwarzwald_tpu.ops import poisson_pallas


def oracle_f32(positions, spacing, analyze=None):
    """Sequential greedy, float32, operation order matching the kernel."""
    pos = positions.astype(np.float32)
    n = pos.shape[0]
    sqs = np.float32(spacing) * np.float32(spacing)
    out = np.zeros(n, dtype=bool)
    accpos = np.zeros((0, 3), dtype=np.float32)
    for i in range(n):
        if analyze is not None and not analyze[i]:
            continue
        if accpos.shape[0]:
            d = accpos - pos[i]
            d2 = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]) + d[:, 2] * d[:, 2]
            if np.any(d2 < sqs):
                continue
        out[i] = True
        accpos = np.vstack([accpos, pos[i:i + 1]])
    return out


def sorted_uniform(n, seed, extent=64.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.0, extent, (n, 3))
    keys, clamped = indexing.index_points(pos, np.zeros(3),
                                          np.full(3, extent))
    keys, order = indexing.sort_with_keys(keys)
    return clamped[order]


@pytest.mark.parametrize("n,spacing,seed", [(4096, 2.0, 7), (6000, 1.0, 8)])
def test_matches_f32_oracle(n, spacing, seed):
    pos = sorted_uniform(n, seed)
    mask = poisson_pallas.poisson_accept_mask_pallas(pos, spacing,
                                                     interpret=True)
    assert mask is not None
    ref = oracle_f32(pos, spacing)
    assert np.array_equal(mask, ref)
    assert 0 < mask.sum() < n


def test_analyze_mask_strided():
    """MIN_DISTANCE_FAST's ::nth analyze pattern (Sampling.h:522-536)."""
    pos = sorted_uniform(4096, 9)
    analyze = np.zeros(4096, dtype=bool)
    analyze[::3] = True
    mask = poisson_pallas.poisson_accept_mask_pallas(pos, 2.5, analyze,
                                                     interpret=True)
    assert mask is not None
    ref = oracle_f32(pos, 2.5, analyze)
    assert np.array_equal(mask, ref)
    assert not mask[~analyze].any()


def test_duplicate_points_first_wins():
    """Exact duplicates: the earliest in Morton order is accepted, the
    rest reject against it (d2 == 0 < spacing^2)."""
    pos = sorted_uniform(4096, 10)
    pos[100:110] = pos[99]  # run of duplicates
    mask = poisson_pallas.poisson_accept_mask_pallas(pos, 1.0,
                                                     interpret=True)
    ref = oracle_f32(pos, 1.0)
    assert np.array_equal(mask, ref)
    assert not mask[100:110].any()


def test_capacity_gates():
    pos = np.zeros((0, 3))
    assert poisson_pallas._prep(pos, 1.0, None) is None
    big = np.zeros((poisson_pallas.MAX_POINTS + 1, 3))
    assert poisson_pallas._prep(big, 1.0, None) is None
    assert poisson_pallas.poisson_accept_mask_pallas(
        np.zeros((16, 3)), -1.0) is None


def test_dense_adjacency_falls_back():
    """All points inside one spacing ball -> every block pairs with every
    other -> the pair-list gate trips and the caller falls back to host."""
    rng = np.random.default_rng(11)
    pos = rng.uniform(0.0, 0.01, (200_000, 3))
    assert poisson_pallas._prep(pos, 5.0, None) is None
