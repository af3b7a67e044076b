"""Multi-chip / multi-host scaling.

Device-mesh sharding lives in ops.device (sharded encode/sort/re-bucket
step); this package adds the host-level coordination for multi-host runs.
"""

from .multihost import MultiHostPlan, plan_multihost_tiling  # noqa: F401
