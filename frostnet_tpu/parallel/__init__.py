"""Device-mesh parallelism (replaces torch.nn.DataParallel and the custom
DataParallelModel/DataParallelCriteria wrappers — SURVEY.md §2.7/§2.8)."""
from .mesh import (
    make_dp_mesh,
    make_mesh,
    shard_batch,
    replicate,
    shard_params_for_mp,
    DEFAULT_MP_RULES,
    cross_replica_mean,
)
from . import multihost

__all__ = [
    "make_dp_mesh",
    "make_mesh",
    "shard_batch",
    "replicate",
    "shard_params_for_mp",
    "DEFAULT_MP_RULES",
    "cross_replica_mean",
    "multihost",
]
