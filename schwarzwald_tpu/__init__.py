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

import os as _os

# Keep large allocations on the brk heap instead of per-allocation mmaps:
# the tiler's hot loops allocate and free tens-of-MB numpy buffers every
# batch, and glibc's default M_MMAP_THRESHOLD returns each one to the OS on
# free, so every batch re-pays first-touch page faults (~45 MB/s on this
# deployment — measured ~20% of a gather-heavy out-of-core run). Tunable
# only via mallopt at runtime; harmless no-op on non-glibc platforms.
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None, use_errno=True)
    _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
except Exception:
    _libc = None


def malloc_trim() -> bool:
    """Release free heap pages back to the OS (glibc malloc_trim(0)).

    The mallopt tuning above trades RSS for throughput: freed big
    buffers stay mapped so the next batch skips first-touch faults.
    SCHWARZWALD_MALLOC_TRIM=1 calls this once per checkpoint window
    (see process/tiler.py) for memory-constrained deployments — opt-in
    because re-faulting costs ~2x wall clock on big-tree runs while the
    peak RSS there is live data, not retained-free heap (measured, see
    README). glibc >= 2.8 releases interior free chunks page-wise, not
    just the heap top. Returns False when unavailable (non-glibc)."""
    try:
        return bool(_libc is not None and _libc.malloc_trim(0) >= 0)
    except Exception:
        return False

import jax

# Positions and distance tests are double precision throughout the reference
# (Vector3<double>); we match that. Morton keys are uint64 (63 bits used).
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the level-synchronous octree sweep is a
# large program (minutes to compile on TPU); caching makes every signature a
# one-time cost across processes. Override dir with SCHWARZWALD_TPU_JAX_CACHE,
# disable with SCHWARZWALD_TPU_JAX_CACHE=0.
_cache_dir = _os.environ.get("SCHWARZWALD_TPU_JAX_CACHE",
                             _os.path.expanduser("~/.cache/schwarzwald_tpu_jax"))
if _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: in-process cache only
        pass

__version__ = "0.1.0"


def tile(sources, output_directory, **options):
    """High-level library entry point: tile LAS files into an octree.

    Equivalent to the CLI --tiler mode; `options` accepts the
    TilerArguments fields (spacing, diagonal_fraction, sampling_strategy,
    tiling_strategy, output_format, max_points_per_node, use_device, ...).
    Returns the PerformanceStats of the run.

        import schwarzwald_tpu as sz
        sz.tile(["cloud.las"], "out/", sampling_strategy="RANDOM_GRID",
                output_format=sz.OutputFormat.CZM_3DTILES, spacing=0.5)
    """
    from .core.attributes import OutputFormat
    from .process.tiler_process import TilerArguments, TilerProcess

    if isinstance(sources, str):
        sources = [sources]
    fmt = options.get("output_format")
    if isinstance(fmt, str):
        options["output_format"] = OutputFormat(fmt)
    if not options.get("spacing") and not options.get("diagonal_fraction"):
        options["diagonal_fraction"] = 250
    args = TilerArguments(sources=list(sources),
                          output_directory=output_directory, **options)
    return TilerProcess(args).run()


def convert(source_folder, output_folder, output_format="3DTILES", **options):
    """High-level converter entry point (CLI --converter mode)."""
    from .process.converter import ConverterArguments, run_conversion

    run_conversion(ConverterArguments(
        source_folder=source_folder, output_folder=output_folder,
        output_format=output_format, **options))


def __getattr__(name):
    if name == "OutputFormat":
        from .core.attributes import OutputFormat
        return OutputFormat
    if name == "SamplingStrategy":
        from .ops.sampling import SamplingStrategy
        return SamplingStrategy
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
