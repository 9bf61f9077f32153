from .api import (
    trace,
    trace_plane,
    trace_target,
    trace_sdf,
    trace_cable,
    trace_ad,
    trace_plane_ad,
    trace_target_ad,
    trace_sdf_ad,
    trace_cable_ad,
)
from .checkpointed import (
    trace_exact,
    trace_plane_exact,
    trace_target_exact,
    trace_sdf_exact,
    trace_cable_exact,
)
from .eikonal import (
    max_steps_fwd,
    max_steps_bwd,
    backtrace,
    backtrace_sdf,
    backtrace_cable,
    trace_scan,
)

__all__ = [
    "trace", "trace_plane", "trace_target", "trace_sdf", "trace_cable",
    "trace_exact", "trace_plane_exact", "trace_target_exact",
    "trace_sdf_exact", "trace_cable_exact",
    "trace_ad", "trace_plane_ad", "trace_target_ad", "trace_sdf_ad",
    "trace_cable_ad", "max_steps_fwd", "max_steps_bwd", "backtrace",
    "backtrace_sdf", "backtrace_cable", "trace_scan",
]
