from .mesh import data_sharding, make_mesh, replicated, shard_batch
from .sharding import param_shardings, param_specs, shard_params

__all__ = [
    "data_sharding", "make_mesh", "replicated", "shard_batch",
    "param_shardings", "param_specs", "shard_params",
]
