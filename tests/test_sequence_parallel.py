"""Sequence-parallel linear attention under shard_map on an 8-device mesh."""

import functools
import importlib

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

la = importlib.import_module(
    "reinforcement_learning_in_music_generation_tpu.ops.linear_attention")


def make_qkv(key, b=2, h=2, s=64, e=8):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (b, h, s, e)),
            jax.random.normal(k2, (b, h, s, e)),
            jax.random.normal(k3, (b, h, s, e)))


def sp_mesh():
    import numpy as onp
    return Mesh(onp.array(jax.devices()[:8]).reshape(8), axis_names=("sp",))


def test_sp_forward_matches_single_device():
    q, k, v = make_qkv(jax.random.PRNGKey(0))
    ref = la.causal_linear_attention(q, k, v, chunk=8, backend="xla")

    mesh = sp_mesh()
    spec = P(None, None, "sp", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    def sp_attn(q, k, v):
        return la.causal_linear_attention_sp(q, k, v, "sp", chunk=8,
                                             backend="xla")

    out = sp_attn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # 8-dev shard_map grad compile (~40s); fwd parity stays fast
def test_sp_gradients_match_single_device():
    q, k, v = make_qkv(jax.random.PRNGKey(1), b=1, h=1, s=32, e=4)
    mesh = sp_mesh()
    spec = P(None, None, "sp", None)

    def loss_ref(q, k, v):
        return jnp.sum(
            la.causal_linear_attention(q, k, v, chunk=4, backend="xla") ** 2)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    def sp_attn(q, k, v):
        return la.causal_linear_attention_sp(q, k, v, "sp", chunk=4,
                                             backend="xla")

    def loss_sp(q, k, v):
        return jnp.sum(sp_attn(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
