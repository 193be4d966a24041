"""Fused decode-layer kernel (interpret mode) vs the reference decode_step."""

import importlib

import pytest

import jax
import jax.numpy as jnp
import numpy as np


pytestmark = pytest.mark.slow  # superseded v1/v2 kernels (ops/experimental); run with -m "" or -m slow

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)

dk = importlib.import_module(
    "reinforcement_learning_in_music_generation_tpu.ops.experimental.decode_kernel")

CFG = C.LinearTransformerConfig(
    vocab_sizes=(10, 12, 8, 16, 9, 7), emb_sizes=(8,) * 6,
    d_model=16, n_layer=2, n_head=2, d_inner=32)


def rand_tokens(key, b, s):
    cols = []
    for i, v in enumerate(CFG.vocab_sizes):
        key, k = jax.random.split(key)
        cols.append(jax.random.randint(k, (b, s), 0, v))
    return jnp.stack(cols, axis=-1).astype(jnp.int32)


def test_fused_decode_matches_reference_interpret():
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = rand_tokens(jax.random.PRNGKey(1), 2, 6)

    ref_state = lt.init_decode_state(CFG, 2)
    aug_state = lt.DecodeState(dk.aug_state_init(CFG, 2), ref_state.z,
                               ref_state.step)
    for i in range(6):
        h_ref, ref_state = lt.decode_step(params, CFG, x[:, i], ref_state)
        h_f, aug_state = dk.fused_decode_step(params, CFG, x[:, i], aug_state,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                                   rtol=5e-3, atol=5e-3)
    # states agree too
    s, z = dk.aug_to_state(aug_state.s)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_state.s),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_state.z),
                               rtol=5e-3, atol=5e-3)


def test_fused_v2_matches_reference_interpret():
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = rand_tokens(jax.random.PRNGKey(1), 2, 5)
    ref_state = lt.init_decode_state(CFG, 2)
    aug_state = lt.DecodeState(dk.aug_state_init(CFG, 2), ref_state.z,
                               ref_state.step)
    for i in range(5):
        h_ref, ref_state = lt.decode_step(params, CFG, x[:, i], ref_state)
        h_f, aug_state = dk.fused_decode_step(params, CFG, x[:, i], aug_state,
                                              interpret=True, variant="v2")
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                                   rtol=5e-3, atol=5e-3)
