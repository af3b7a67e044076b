"""MIN_DISTANCE (Poisson-disk) sampling on device — SURVEY hard-part #1.

The reference's Poisson sampler is an inherently sequential greedy pass:
accept a point iff no previously ACCEPTED point lies within `spacing`
(PoissonDiskSampling::sample_points, Sampling.h:444-465; SparseGrid::add,
SparseGrid.cpp:117-147 — the hash grid only bounds the neighbor search,
acceptance is a true-distance test).

Device formulation — bounded-Morton-window parallel relaxation:

  * Cells are the Morton-aligned octree cells of depth D, chosen so the
    cell side is >= spacing (side in [spacing, 2*spacing)). Then every
    point within `spacing` of p lies in p's cell or one of its 26
    neighbors, and each cell is a CONTIGUOUS RUN of the Morton-sorted
    order — the "bounded Morton window".
  * Fixpoint iteration over a 3-state array (UNKNOWN/ACCEPTED/REJECTED):
    a point REJECTS as soon as any earlier-in-order close neighbor is
    ACCEPTED; it ACCEPTS when no earlier close neighbor is ACCEPTED or
    UNKNOWN (i.e. all earlier close neighbors are decided-rejected).
    The earliest UNKNOWN point always decides, so each lax.while_loop
    round strictly reduces the unknown count — and the fixpoint equals
    the sequential greedy result exactly (the decision of point i depends
    only on decisions of earlier points, and every rule above is the
    sequential rule restated monotonically).

Exactness: distances are f64 and the squared spacing is the reference's
float32 product (Sampling.h:448-449), identical to the host oracle — so
results are bit-equal on backends with real f64 (CPU). On TPU (v5e) f64 is
emulated and ~0.004% of boundary-distance comparisons may round differently
(see ARCHITECTURE.md); the parity tests therefore pin the cpu backend, and
the engine treats TPU output as valid sampling (same density guarantees)
rather than bit-parity.

Capacity: segments longer than `max_seg` points (pathologically dense
cells) return None -> the caller falls back to the host kernel.
"""
from __future__ import annotations

import functools

import jax
import numpy as np

from ..core import morton

UNKNOWN, ACCEPTED, REJECTED = 0, 1, 2

_OFFSETS = [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def cell_depth(root_extent_x: float, spacing: float) -> int:
    """Largest depth whose cell side still covers `spacing`."""
    spacing_f = float(np.float32(spacing))
    if spacing_f <= 0 or root_extent_x <= 0:
        return -1
    d = int(np.floor(np.log2(root_extent_x / spacing_f)))
    return d


@functools.partial(jax.jit, static_argnames=("max_seg", "n_offsets"))
def _relax(pos, seg_lo, seg_len, analyze, sq_spacing,
           max_seg: int, n_offsets: int):
    import jax.numpy as jnp
    from jax import lax

    n = pos.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    status0 = jnp.where(analyze, jnp.int8(UNKNOWN), jnp.int8(REJECTED))

    def one_round(status):
        rej_any = jnp.zeros(n, bool)
        unk_any = jnp.zeros(n, bool)

        def offset_body(o, carry):
            rej, unk = carry
            lo = lax.dynamic_index_in_dim(seg_lo, o, axis=1, keepdims=False)
            ln = lax.dynamic_index_in_dim(seg_len, o, axis=1, keepdims=False)

            def k_body(k, carry2):
                rej2, unk2 = carry2
                j = lo + k
                m = (k < ln) & (j < iota) & (j >= 0)
                jc = jnp.clip(j, 0, n - 1)
                d = pos - pos[jc]
                close = m & (jnp.sum(d * d, axis=1) < sq_spacing)
                sj = status[jc]
                rej2 = rej2 | (close & (sj == ACCEPTED))
                unk2 = unk2 | (close & (sj == UNKNOWN))
                return rej2, unk2

            return lax.fori_loop(0, max_seg, k_body, (rej, unk))

        rej_any, unk_any = lax.fori_loop(0, n_offsets, offset_body,
                                         (rej_any, unk_any))
        unknown = status == UNKNOWN
        status = jnp.where(unknown & rej_any, jnp.int8(REJECTED), status)
        status = jnp.where(unknown & ~rej_any & ~unk_any,
                           jnp.int8(ACCEPTED), status)
        return status

    status = lax.while_loop(
        lambda s: jnp.any(s == UNKNOWN), one_round, status0)
    return status == ACCEPTED


def poisson_accept_mask_device(sorted_keys: np.ndarray,
                               positions: np.ndarray,
                               root_extent_x: float, spacing: float,
                               analyze_mask: np.ndarray | None = None,
                               backend: str | None = None,
                               max_seg: int = 48) -> np.ndarray | None:
    """Device Poisson-disk acceptance over one Morton-sorted range.

    Returns the boolean accept mask (same contract as the native
    poisson_accept_mask) or None when the device can't do it exactly
    (cell depth out of Morton range, or a cell run exceeding max_seg).
    """
    n = positions.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    dev = (jax.devices(backend)[0] if backend in ("cpu", "tpu")
           else jax.devices()[0])
    if dev.platform != "cpu":
        # ROUND-5: on a real accelerator the VMEM-resident Pallas kernel
        # (ops/poisson_pallas) replaces the XLA fixpoint relaxation — same
        # greedy semantics, ~200x the throughput (the relaxation's
        # per-round full-array gathers ran at 5.4 kpts/s on v5e, a
        # documented round-4 finding). f32 positions mean TPU output is
        # valid-sampling-not-bit-parity vs the f64 host oracle (module
        # docstring); the cpu backend below keeps f64 for the bit-exact
        # parity tests.
        from . import poisson_pallas
        return poisson_pallas.poisson_accept_mask_pallas(
            positions, spacing, analyze_mask, device=dev)
    depth = cell_depth(root_extent_x, spacing)
    if depth < 1 or depth > morton.MAX_LEVELS:
        return None

    cells = morton.truncate_to_level(sorted_keys, depth - 1)
    gx, gy, gz = morton.grid_coords(cells, depth)
    side = np.int64(1) << np.int64(depth)

    # contiguous run per cell: searchsorted for all 27 neighbor cells
    seg_lo = np.empty((n, len(_OFFSETS)), dtype=np.int32)
    seg_len = np.empty((n, len(_OFFSETS)), dtype=np.int32)
    gx = gx.astype(np.int64)
    gy = gy.astype(np.int64)
    gz = gz.astype(np.int64)
    for o, (dx, dy, dz) in enumerate(_OFFSETS):
        nx, ny, nz = gx + dx, gy + dy, gz + dz
        in_bounds = ((nx >= 0) & (nx < side) & (ny >= 0) & (ny < side)
                     & (nz >= 0) & (nz < side))
        ncode = morton.from_grid_coords(np.clip(nx, 0, side - 1),
                                        np.clip(ny, 0, side - 1),
                                        np.clip(nz, 0, side - 1))
        lo = np.searchsorted(cells, ncode, side="left")
        hi = np.searchsorted(cells, ncode, side="right")
        length = np.where(in_bounds, hi - lo, 0)
        seg_lo[:, o] = lo
        seg_len[:, o] = length
    if int(seg_len.max(initial=0)) > max_seg:
        return None  # pathologically dense cell: host kernel handles it

    # reference float32 spacing narrowing (Sampling.h:448-449)
    sq_spacing = float(np.float32(spacing) * np.float32(spacing))
    analyze = (np.ones(n, dtype=bool) if analyze_mask is None
               else np.asarray(analyze_mask, dtype=bool))

    # pad to the next power of two: bounds jit recompiles to log2(n) shapes
    # (padding points sit at 1e30 with empty segments and REJECTED status,
    # invisible to real points)
    n_pad = 1 << max(0, (n - 1).bit_length())
    if n_pad != n:
        pad = n_pad - n
        positions = np.concatenate(
            [positions, np.full((pad, 3), 1e30, dtype=np.float64)])
        seg_lo = np.vstack([seg_lo,
                            np.zeros((pad, len(_OFFSETS)), np.int32)])
        seg_len = np.vstack([seg_len,
                             np.zeros((pad, len(_OFFSETS)), np.int32)])
        analyze = np.concatenate([analyze, np.zeros(pad, bool)])

    dev = (jax.devices(backend)[0] if backend in ("cpu", "tpu")
           else jax.devices()[0])
    with jax.default_device(dev):
        mask = np.asarray(_relax(
            np.ascontiguousarray(positions), seg_lo, seg_len, analyze,
            sq_spacing, max_seg=max_seg, n_offsets=len(_OFFSETS)))
    return mask[:n]
