"""Parameter sharding rules (Megatron-style tensor parallel layout).

Path-pattern -> PartitionSpec over the ('dp', 'tp') mesh.  Column-parallel
for qkv/ffn-in/heads/embedding dims, row-parallel for the attention output
and ffn-out projections; norms and small heads replicated.  Stacked layer
params carry a leading layer axis (always unsharded).

XLA GSPMD derives the activation shardings and inserts psum/all-gather
collectives on the ICI mesh; these specs only pin the weights.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over key path, spec builder given leaf ndim)
_RULES = [
    # field embeddings: (V, E) -> shard embedding dim
    (r"\['emb'\]", lambda nd: P(None, "tp")),
    # input projection (concat -> d_model): column parallel
    (r"\['in_linear'\]\['w'\]", lambda nd: P(None, "tp")),
    (r"\['in_linear'\]\['b'\]", lambda nd: P("tp")),
    (r"\['proj'\]\['w'\]", lambda nd: P(None, "tp")),
    (r"\['proj'\]\['b'\]", lambda nd: P("tp")),
    # stacked layers (leading L axis)
    (r"\['layers'\]\['w[qkv]'\]\['w'\]", lambda nd: P(None, None, "tp")),
    (r"\['layers'\]\['w[qkv]'\]\['b'\]", lambda nd: P(None, "tp")),
    (r"\['layers'\]\['wo'\]\['w'\]", lambda nd: P(None, "tp", None)),
    (r"\['layers'\]\['ffn1'\]\['w'\]", lambda nd: P(None, None, "tp")),
    (r"\['layers'\]\['ffn1'\]\['b'\]", lambda nd: P(None, "tp")),
    (r"\['layers'\]\['ffn2'\]\['w'\]", lambda nd: P(None, "tp", None)),
    # output heads: row parallel over d_model (vocab sizes like 135/87 are
    # not divisible by tp; GSPMD inserts the psum over 'tp')
    (r"\['heads'\]\[.*\]\['w'\]", lambda nd: P("tp", None)),
]


def spec_for_path(path_str: str, ndim: int) -> P:
    for pattern, builder in _RULES:
        if re.search(pattern, path_str):
            spec = builder(ndim)
            if len(spec) <= ndim:
                return spec
    return P()


def param_specs(params: Any) -> Any:
    """Pytree of PartitionSpecs mirroring `params`."""
    def leaf_spec(kp, leaf):
        return spec_for_path(jax.tree_util.keystr(kp), leaf.ndim)
    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params on the mesh according to the rules."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(mesh, params))


def zero1_specs(mesh: Mesh, params: Any) -> Any:
    """Pytree of PartitionSpecs for ZeRO-1 optimizer-state sharding:
    each leaf's spec is its Megatron param spec PLUS 'dp' on the largest
    still-unsharded axis divisible by dp — so Adam's mu/nu live dp-sharded
    (memory / dp) while the params themselves stay dp-replicated.  Leaves
    with no dp-divisible free axis stay on the param spec (replicated
    over dp); for the flagship model that is only the scalar/1-D crumbs —
    the big (L, D, 3D) stacks all shard."""
    dp = mesh.shape.get("dp", 1)

    def leaf_spec(kp, leaf):
        base = spec_for_path(jax.tree_util.keystr(kp), leaf.ndim)
        entries = list(base) + [None] * (leaf.ndim - len(base))
        if dp > 1:
            free = [i for i in range(leaf.ndim)
                    if entries[i] is None and leaf.shape[i] % dp == 0
                    and leaf.shape[i] >= dp]
            if free:
                entries[max(free, key=lambda i: leaf.shape[i])] = "dp"
        return P(*entries)
    return jax.tree_util.tree_map_with_path(leaf_spec, params)
