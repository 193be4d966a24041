"""Blocked vs dense window attention parity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import importlib

wa = importlib.import_module(
    "reinforcement_learning_in_music_generation_tpu.ops.window_attention")


def make(b=2, h=2, s=100, d=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    mask = (jax.random.uniform(ks[3], (b, s)) > 0.2).astype(jnp.float32)
    mask = mask.at[:, :4].set(1.0)    # keep softmax rows non-degenerate
    return q, k, v, mask


def test_blocked_matches_dense():
    q, k, v, mask = make(s=100)
    for window in (8, 20, 50):
        dense = wa._window_attention_dense(q, k, v, mask, window=window,
                                           rel_emb=None)
        blocked = wa.window_attention_blocked(q, k, v, mask, window=window,
                                              block=32)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # optional relative-key variant (~8s)
def test_blocked_matches_dense_relative():
    q, k, v, mask = make(s=64)
    rel = jax.random.normal(jax.random.PRNGKey(9), (2 * 16 + 1, q.shape[-1])) * 0.1
    dense = wa._window_attention_dense(q, k, v, mask, window=10, rel_emb=rel)
    blocked = wa.window_attention_blocked(q, k, v, mask, window=10,
                                          rel_emb=rel, block=16)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # long-sequence dispatch probe (~9s)
def test_dispatch_uses_blocked_for_long_seqs():
    q, k, v, mask = make(s=1200, d=4, h=1, b=1)
    out = wa.window_attention(q, k, v, mask, window=32, block_threshold=1024)
    dense = wa._window_attention_dense(q, k, v, mask, window=32, rel_emb=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # gradient cousin of blocked_matches_dense (~8s)
def test_blocked_gradients_flow():
    q, k, v, mask = make(s=48, d=4)

    def loss(q, k, v):
        return jnp.sum(wa.window_attention_blocked(q, k, v, mask, window=8,
                                                   block=16) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).sum()) > 0


@pytest.mark.slow  # cross-layout sweep (~22s); integration guarded by test_models
def test_bshe_matches_bhsd_dense_and_blocked():
    """window_attention_bshe == window_attention on transposed tensors,
    in both dispatch regimes, with and without rel_emb, incl. grads."""
    q, k, v, mask = make(s=100)
    rel = jax.random.normal(jax.random.PRNGKey(9), (2 * 64 + 1, 8)) * 0.1
    t = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    for s_thresh, r in ((1024, None), (1024, rel), (8, None), (8, rel)):
        ref = wa.window_attention(q, k, v, mask, window=24, rel_emb=r,
                                  block_threshold=s_thresh)
        got = wa.window_attention_bshe(t(q), t(k), t(v), mask, window=24,
                                       rel_emb=r, block_threshold=s_thresh,
                                       block=32)
        np.testing.assert_allclose(np.asarray(t(got)), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"thresh={s_thresh} rel={r is not None}")

    def loss_ref(q):
        return jnp.sum(jnp.sin(wa.window_attention(q, k, v, mask, window=24,
                                                   block_threshold=8)))

    def loss_bshe(q):
        o = wa.window_attention_bshe(t(q), t(k), t(v), mask, window=24,
                                     block_threshold=8, block=32)
        return jnp.sum(jnp.sin(t(o)))

    np.testing.assert_allclose(np.asarray(jax.grad(loss_bshe)(q)),
                               np.asarray(jax.grad(loss_ref)(q)),
                               rtol=5e-4, atol=5e-4)
