from .mesh import data_sharding, make_mesh, replicated, shard_batch
from .pipeline import (
    make_pp_mesh,
    pipeline_forward_hidden,
    pipeline_train_losses,
    pipeline_train_step,
    shard_params_pp,
)
from .sharding import param_shardings, param_specs, shard_params

__all__ = [
    "data_sharding", "make_mesh", "replicated", "shard_batch",
    "param_shardings", "param_specs", "shard_params",
    "make_pp_mesh", "pipeline_forward_hidden", "pipeline_train_losses",
    "pipeline_train_step", "shard_params_pp",
]
