from .mesh import (
    make_ray_mesh,
    make_sharded_trace,
    make_sharded_trace_plane,
    pad_rays,
    shard_rays,
    replicate,
)
from .distributed import initialize, process_info, local_ray_slice
