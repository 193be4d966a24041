"""Batched generation sharded over the dp mesh axis (serving scale-out):
same tokens as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.parallel import make_mesh

TINY = C.LinearTransformerConfig(
    vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6,
    d_model=16, n_layer=1, n_head=2, d_inner=32)


def test_generation_sharded_over_batch():
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    b = 8
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None],
                    (b, 1, 1))

    ref = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(1), init,
                                  max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))

    mesh = make_mesh(dp=8, tp=1)
    params_r = jax.device_put(
        params, NamedSharding(mesh, P()))
    init_s = jax.device_put(init, NamedSharding(mesh, P("dp", None, None)))
    out = sampler.generate_tokens(params_r, TINY, jax.random.PRNGKey(1),
                                  init_s, max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_generation_sharded_tp():
    """Tensor-parallel decode (VERDICT r1, Next #9): Megatron-sharded
    weights (heads shard over the qkv column dim), greedy tokens identical
    to single-device decode."""
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        shard_params)

    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    b = 4
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None],
                    (b, 1, 1))
    ref = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(1), init,
                                  max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))

    mesh = make_mesh(dp=1, tp=2)
    params_s = shard_params(mesh, params)
    init_r = jax.device_put(init, NamedSharding(mesh, P()))
    out = sampler.generate_tokens(params_s, TINY, jax.random.PRNGKey(1),
                                  init_r, max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_generation_sharded_dp_tp():
    """Combined dp x tp serving layout: batch over dp, weights over tp."""
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        shard_params)

    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    b = 8
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None],
                    (b, 1, 1))
    ref = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(1), init,
                                  max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))

    mesh = make_mesh(dp=4, tp=2)
    params_s = shard_params(mesh, params)
    init_s = jax.device_put(init, NamedSharding(mesh, P("dp", None, None)))
    out = sampler.generate_tokens(params_s, TINY, jax.random.PRNGKey(1),
                                  init_s, max_tokens=12, greedy=True,
                                  settings=tuple(sampler.smp.GREEDY))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
