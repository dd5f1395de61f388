from slam_tpu.parallel.fleet import ShardedMCLFleet, shard_fleet
from slam_tpu.parallel.mesh import make_mesh
from slam_tpu.parallel.sharded import (
    ShardedGridSLAM,
    ShardedMCL,
    shard_state,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "ShardedGridSLAM",
    "ShardedMCL",
    "ShardedMCLFleet",
    "shard_fleet",
    "shard_state",
    "state_shardings",
]
