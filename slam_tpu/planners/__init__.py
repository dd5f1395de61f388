from slam_tpu.planners.astar import AStar
from slam_tpu.planners.hastar import HybridAStar
from slam_tpu.planners.rrtstar import RRTStar

__all__ = ["AStar", "HybridAStar", "RRTStar"]
