"""Host->device input pipeline: depth-k prefetch of training batches.

The reference feeds torch tensors synchronously from host memory
(dqn_policy/agent_pretrain.py:541-556).  On the tunneled TPU every
host->device dispatch costs ~10-40 ms (BENCH.md methodology), so a loop
that converts + transfers its batch inline serializes that latency with
the step.  JAX transfers are asynchronous — `jax.device_put` returns
immediately with the copy in flight — so a small look-ahead window is
enough to hide them: slice/convert/dispatch batch i+depth while batch i
trains.  No threads, deterministic order, nothing to shut down on early
exit.

Used by train/pretrain.py:pretrain; `mesh` routes each batch through
parallel.shard_batch (dp sharding) instead of a plain device_put.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp


def prefetch_batches(train_x, train_y, train_mask, batch_size: int,
                     mesh=None, depth: int = 2
                     ) -> Iterator[Tuple[int, tuple]]:
    """Yield (batch_index, (x, y, mask)) with device transfers issued
    `depth` batches ahead.  Batch order and contents are identical to
    slicing inline (tests/test_utils.py pins this)."""
    num_batch = len(train_x) // batch_size
    depth = max(1, depth)

    def dispatch(i: int):
        lo, hi = i * batch_size, (i + 1) * batch_size
        batch = (jnp.asarray(train_x[lo:hi]), jnp.asarray(train_y[lo:hi]),
                 jnp.asarray(train_mask[lo:hi], jnp.float32))
        if mesh is not None:
            from ..parallel import shard_batch
            batch = shard_batch(mesh, batch)
        return batch

    window: deque = deque()
    for i in range(min(depth, num_batch)):
        window.append(dispatch(i))
    for i in range(num_batch):
        batch = window.popleft()
        nxt = i + depth
        if nxt < num_batch:
            window.append(dispatch(nxt))
        yield i, batch
