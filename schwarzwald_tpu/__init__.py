"""schwarzwald_tpu — a TPU-native point-cloud tiling framework.

A from-scratch rebuild of the capabilities of igd-geo/schwarzwald (a C++
multi-threaded LAS/LAZ -> octree tiler, see /root/reference) designed for
TPU hardware: the hot tiling core (Morton-64 encoding, spatial sort, octant
partitioning, and all sampling strategies) runs as data-parallel JAX/XLA/Pallas
programs with level-synchronous batched node processing, fed by a host-side
streaming I/O pipeline and shardable across a `jax.sharding.Mesh`.

Reference parity targets (cited throughout as reference file:line):
  - Octree structure & per-node point selection semantics:
    schwarzwald/core/tiling/{TilingAlgorithms,Sampling,OctreeAlgorithms}
  - Output formats: 3D Tiles (pnts + tileset.json), Entwine/EPT, LAS/LAZ,
    binary dumps: schwarzwald/core/io/
  - CLI surface: schwarzwald/executable/main.cpp
"""

import jax

# Positions and distance tests are double precision throughout the reference
# (Vector3<double>); we match that. Morton keys are uint64 (63 bits used).
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
