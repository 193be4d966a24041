"""Flash-band Pallas window attention: parity vs the XLA dense band form
(interpret mode on CPU), forward and gradients."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

wa = importlib.import_module(
    "reinforcement_learning_in_music_generation_tpu.ops.window_attention")
wak = importlib.import_module(
    "reinforcement_learning_in_music_generation_tpu.ops."
    "window_attention_kernel")


def make_inputs(b=2, h=2, s=160, d=16, seed=0, masked_tail=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    mask = jnp.ones((b, s), jnp.float32)
    if masked_tail:
        mask = mask.at[0, -17:].set(0.0)  # padding on one song
    return q, k, v, mask


@pytest.mark.parametrize("window,block", [(50, 64), (100, 64), (128, 64)])
def test_forward_parity(window, block):
    q, k, v, mask = make_inputs()
    ref = wa._window_attention_dense(q, k, v, mask, window=window,
                                     rel_emb=None)
    got = wak.window_attention_pallas(q, k, v, mask, window, block,
                                      True)
    valid = np.asarray(mask)[:, None, :, None] > 0
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(ref) * valid,
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    q, k, v, mask = make_inputs(s=128)
    window, block = 64, 64

    def loss_ref(q, k, v):
        o = wa._window_attention_dense(q, k, v, mask, window=window,
                                       rel_emb=None)
        return jnp.mean(jnp.square(o * (mask[:, None, :, None] > 0)))

    def loss_ker(q, k, v):
        o = wak.window_attention_pallas(q, k, v, mask, window, block, True)
        return jnp.mean(jnp.square(o * (mask[:, None, :, None] > 0)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_no_mask_and_unaligned_s():
    q, k, v, _ = make_inputs(s=150, masked_tail=False)
    window, block = 40, 64
    ref = wa._window_attention_dense(q, k, v, None, window=window,
                                     rel_emb=None)
    got = wak.window_attention_pallas(q, k, v, None, window, block, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
