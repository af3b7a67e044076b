"""VMEM-resident Pallas MIN_DISTANCE kernel — the TPU Poisson sampler.

Semantics (identical to the reference's greedy pass,
PoissonDiskSampling::sample_points, Sampling.h:444-465 / SparseGrid::add,
SparseGrid.cpp:117-147): walk the Morton-sorted range in order and accept
a point iff no previously ACCEPTED point lies strictly within `spacing`.
The hash grid in the reference only bounds the neighbour search; acceptance
is a true-distance test — so any formulation that checks every earlier
accepted point within `spacing` reproduces it exactly.

TPU formulation — block-sequential greedy over AABB-adjacent block pairs:

  * The sorted range is cut into fixed blocks of B consecutive points.
    Blocks are index ranges, so "every earlier point" = "every point in an
    earlier block" + "earlier points in my own block".
  * Points interact only within `spacing`, so block bj can affect block bi
    only if AABB(bj) intersects AABB(bi) inflated by `spacing`. The host
    computes that adjacency once (vectorised numpy over per-block AABBs)
    and hands the kernel a flat (bi, bj) pair list sorted by bi, bj — the
    intra pair (bj == bi) is therefore last in each group.
  * ONE pallas_call walks the pair list as its grid (scalar-prefetched
    indices drive the block index maps, so Pallas's pipeline DMAs the two
    position blocks per pair from HBM). The accept mask for ALL blocks
    lives in a VMEM-resident output buffer (constant index map), so
    earlier blocks' final decisions are read back on-chip:
    - cross pair (bj < bi): d2 = (B,B) squared distances on the VPU,
      ext_rej_i |= any(close & accepted_j) via an MXU matvec.
    - intra pair (bj == bi): strict-lower close matrix, then the
      earliest-undecided relaxation (UNKNOWN/ACCEPTED/REJECTED) as a
      while_loop of two MXU matvecs per round — each round decides at
      least the earliest undecided point, so it terminates in
      chain-depth rounds and equals the sequential greedy result.
  * All arithmetic is float32: d2 = ((dx*dx + dy*dy) + dz*dz) with
    f32 subtract/multiply/add, compared against the reference's float32
    spacing product (Sampling.h:448-449). The pure-numpy oracle in
    tests/test_poisson_pallas.py reproduces the kernel bit-exactly; vs
    the f64 host kernel only boundary-distance accepts can differ
    (documented TPU deviation, ARCHITECTURE.md).

Tunnel-byte discipline (this deployment reaches the TPU through an
85/32 MB/s tunnel): positions ship as 3 f32 planes (the analyze plane is
added only for MIN_DISTANCE_FAST's strided masks), and the mask comes
back as int8, packed on-device after the pallas_call.

Capacity gates (return None -> caller falls back to the host kernel):
ranges beyond MAX_POINTS (the accept buffer must stay VMEM-resident) and
pathological adjacency (pair list > MAX_PAIRS_PER_BLOCK * n_blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 512
MAX_POINTS = 1 << 20          # accept buffer: 2^20 * 4B = 4 MB VMEM
MAX_PAIRS_PER_BLOCK = 96


def _prep(positions: np.ndarray, spacing: float,
          analyze_mask: np.ndarray | None):
    """Host-side prep: f32 planes, per-block AABBs, adjacency pair list.

    Returns None when the range is out of the kernel's capacity envelope.
    """
    n = positions.shape[0]
    if n == 0 or n > MAX_POINTS:
        return None
    n_blocks_real = -(-n // BLOCK)
    # pow2 block count bounds jit recompiles to log2(n) shapes
    n_blocks = 1 << max(3, (n_blocks_real - 1).bit_length())
    n_pad = n_blocks * BLOCK

    pos = np.full((n_pad, 3), 1e30, dtype=np.float32)
    pos[:n] = positions.astype(np.float32)

    # per-block AABBs: full-block min/max in f32, then fix the one partial
    # block (its 1e30 pads would inflate the max); pad blocks get +/-inf
    # AABBs that overlap nothing
    pb = pos[:n_blocks_real * BLOCK].reshape(n_blocks_real, BLOCK, 3)
    mins = np.full((n_blocks, 3), np.inf, dtype=np.float64)
    maxs = np.full((n_blocks, 3), -np.inf, dtype=np.float64)
    mins[:n_blocks_real] = pb.min(axis=1)
    maxs[:n_blocks_real] = pb.max(axis=1)
    tail = n - (n_blocks_real - 1) * BLOCK
    if tail < BLOCK:
        mins[n_blocks_real - 1] = pb[-1, :tail].min(axis=0)
        maxs[n_blocks_real - 1] = pb[-1, :tail].max(axis=0)

    # inflate by spacing (+1e-4 relative: the kernel's f32 d2 rounding can
    # admit pairs a hair beyond the true spacing; the AABB prune must
    # never be tighter than the kernel's own close test)
    s = float(np.float32(spacing)) * (1.0 + 1e-4)
    inter = np.ones((n_blocks, n_blocks), dtype=bool)
    for a in range(3):
        lo_i = (mins[:, a] - s)[:, None]
        hi_i = (maxs[:, a] + s)[:, None]
        inter &= (lo_i <= maxs[None, :, a]) & (hi_i >= mins[None, :, a])
    bi_idx = np.arange(n_blocks, dtype=np.int32)
    inter &= bi_idx[:, None] >= bi_idx[None, :]
    pairs = np.argwhere(inter)  # row-major: bi asc, bj asc -> intra last
    n_pairs = pairs.shape[0]
    if n_pairs > MAX_PAIRS_PER_BLOCK * n_blocks_real:
        return None

    n_pairs_pad = 1 << max(3, (n_pairs - 1).bit_length())
    pair_bi = np.full(n_pairs_pad, n_blocks - 1, dtype=np.int32)
    pair_bj = np.full(n_pairs_pad, n_blocks - 1, dtype=np.int32)
    pair_first = np.zeros(n_pairs_pad, dtype=np.int32)
    pair_valid = np.zeros(n_pairs_pad, dtype=np.int32)
    pair_bi[:n_pairs] = pairs[:, 0]
    pair_bj[:n_pairs] = pairs[:, 1]
    pair_valid[:n_pairs] = 1
    if n_pairs:
        pair_first[0] = 1
        pair_first[1:n_pairs] = pairs[1:, 0] != pairs[:-1, 0]

    sq_spacing = np.array(
        [[np.float32(spacing) * np.float32(spacing)]], dtype=np.float32)
    # planes: x, y, z [, analyze] — (n_blocks, P, B) so the per-pair block
    # (1, P, B) meets the TPU block-shape rule (trailing dims = array dims)
    n_planes = 3 if analyze_mask is None else 4
    planes = np.empty((n_blocks, n_planes, BLOCK), dtype=np.float32)
    planes[:, :3] = pos.reshape(n_blocks, BLOCK, 3).transpose(0, 2, 1)
    if analyze_mask is not None:
        analyze = np.zeros(n_pad, dtype=np.float32)
        analyze[:n] = np.asarray(analyze_mask, dtype=np.float32)
        planes[:, 3] = analyze.reshape(n_blocks, BLOCK)
    return (planes, sq_spacing, pair_bi, pair_bj, pair_first,
            pair_valid, n, n_blocks)


def _kernel(bi_r, bj_r, first_r, valid_r,      # scalar prefetch (SMEM)
            sqs_ref, pos_i_ref, pos_j_ref,      # inputs
            out_ref,                            # (n_blocks, B) accept f32
            ext_ref,                            # scratch (8, B) f32
            *, has_analyze: bool):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    p = pl.program_id(0)

    @pl.when(valid_r[p] == 1)
    def _():
        bi = bi_r[p]
        bj = bj_r[p]
        sqs = sqs_ref[0, 0]

        @pl.when(first_r[p] == 1)
        def _():
            ext_ref[0:1, :] = jnp.zeros((1, BLOCK), jnp.float32)

        plane_i = pos_i_ref[0]                # (P, B): x, y, z [, analyze]
        plane_j = pos_j_ref[0]
        xi = plane_i[0:1, :].reshape(BLOCK, 1)  # i -> sublanes (rows)
        yi = plane_i[1:2, :].reshape(BLOCK, 1)
        zi = plane_i[2:3, :].reshape(BLOCK, 1)
        xj = plane_j[0:1, :]                  # j -> lanes (cols), (1, B)
        yj = plane_j[1:2, :]
        zj = plane_j[2:3, :]
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2 = (dx * dx + dy * dy) + dz * dz    # f32, oracle-matched order
        close = d2 < sqs                      # (B, B) rows=i, cols=j

        @pl.when(bj != bi)
        def _cross():
            acc_j = out_ref[pl.ds(bj, 1), :]  # earlier block: final
            hits = jnp.dot(close.astype(jnp.float32),
                           acc_j.reshape(BLOCK, 1),
                           preferred_element_type=jnp.float32)  # (B, 1)
            ext_ref[0:1, :] = jnp.maximum(
                ext_ref[0:1, :], (hits > 0).astype(jnp.float32)
                .reshape(1, BLOCK))

        @pl.when(bj == bi)
        def _intra():
            rows = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
            cols = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
            close_lower = (close & (rows > cols)).astype(jnp.float32)
            ext = ext_ref[0:1, :].reshape(BLOCK, 1)
            if has_analyze:
                ana = plane_i[3:4, :].reshape(BLOCK, 1)
            else:
                # pad points (at 1e30) may self-accept; their rows are
                # beyond n and sliced off by the caller, and they are
                # never `close` to any real point
                ana = jnp.ones((BLOCK, 1), jnp.float32)
            und0 = ana * (1.0 - jnp.minimum(ext, 1.0))
            acc0 = jnp.zeros((BLOCK, 1), jnp.float32)

            def cond(carry):
                _, und = carry
                return jnp.sum(und) > 0

            def body(carry):
                acc, und = carry
                acc_hits = jnp.dot(close_lower, acc,
                                   preferred_element_type=jnp.float32)
                und_hits = jnp.dot(close_lower, und,
                                   preferred_element_type=jnp.float32)
                is_und = und > 0
                newly_rej = is_und & (acc_hits > 0)
                newly_acc = is_und & (acc_hits == 0) & (und_hits == 0)
                acc = acc + newly_acc.astype(jnp.float32)
                und = (und * (1.0 - newly_rej.astype(jnp.float32))
                       * (1.0 - newly_acc.astype(jnp.float32)))
                return acc, und

            acc, _ = lax.while_loop(cond, body, (acc0, und0))
            out_ref[pl.ds(bi, 1), :] = acc.reshape(1, BLOCK)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "has_analyze", "interpret"))
def _run(planes, sqs, pair_bi, pair_bj, pair_first, pair_valid,
         n_blocks: int, has_analyze: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pairs = pair_bi.shape[0]
    n_planes = 4 if has_analyze else 3
    # the package enables jax x64 globally; index maps must return i32 or
    # Mosaic fails to legalize the transform function
    zero = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda p, *refs: (zero, zero),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_planes, BLOCK),
                         lambda p, bi_r, bj_r, f_r, v_r:
                         (bi_r[p], zero, zero)),
            pl.BlockSpec((1, n_planes, BLOCK),
                         lambda p, bi_r, bj_r, f_r, v_r:
                         (bj_r[p], zero, zero)),
        ],
        out_specs=pl.BlockSpec((n_blocks, BLOCK),
                               lambda p, *refs: (zero, zero)),
        scratch_shapes=[pltpu.VMEM((8, BLOCK), jnp.float32)],
    )
    mask_f32 = pl.pallas_call(
        functools.partial(_kernel, has_analyze=has_analyze),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, BLOCK), jnp.float32),
        interpret=interpret,
    )(pair_bi, pair_bj, pair_first, pair_valid, sqs, planes, planes)
    # int8 for the device->host transfer (the tunnel reads at ~32 MB/s)
    return (mask_f32 > 0).astype(jnp.int8)


def poisson_accept_mask_pallas(positions: np.ndarray, spacing: float,
                               analyze_mask: np.ndarray | None = None,
                               device=None,
                               interpret: bool = False) -> np.ndarray | None:
    """Poisson-disk accept mask for one Morton-sorted range, on TPU.

    `positions` must be in Morton order (the adjacency stays compact
    because consecutive points are spatial neighbours; correctness does
    not depend on it). Returns the boolean mask or None when the range is
    outside the kernel's capacity envelope.
    """
    if spacing <= 0:
        return None
    prep = _prep(np.asarray(positions, dtype=np.float64), spacing,
                 analyze_mask)
    if prep is None:
        return None
    (planes, sqs, pair_bi, pair_bj, pair_first, pair_valid,
     n, n_blocks) = prep
    if device is None:
        device = jax.devices()[0]
    with jax.default_device(device):
        mask = np.asarray(_run(planes, sqs, pair_bi, pair_bj,
                               pair_first, pair_valid,
                               n_blocks=n_blocks,
                               has_analyze=analyze_mask is not None,
                               interpret=interpret))
    return mask.reshape(-1)[:n] > 0
