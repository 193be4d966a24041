"""Device mesh construction for pjit training.

Green-field (the reference is single-GPU single-process, SURVEY §2.5):
a 2D ('dp', 'tp') mesh over ICI.  Data parallel over 'dp'; the wide
embedding concat (1216), attention heads, FFN hidden (2048) and the six
output heads shard naturally over 'tp' (Megatron layout), so XLA GSPMD
inserts all-reduce/all-gather collectives on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, tp)
    if dp <= 0:
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) axis over dp."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Shard each leaf's leading axis over dp; leaves whose leading dim is
    not divisible by dp (e.g. an RL batch of 30 on dp=4) are replicated —
    GSPMD still shards the tp matmuls inside the step."""
    dp = mesh.shape["dp"]

    def put(x):
        if x.ndim and x.shape[0] % dp == 0:
            return jax.device_put(x, data_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))
    return jax.tree_util.tree_map(put, batch)
