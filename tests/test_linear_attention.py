"""Causal linear attention: XLA and Pallas kernels vs a naive O(N^2) oracle,
gradients vs autodiff, and recurrent-step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu.ops import linear_attention as la


def naive(q, k, v, eps=1e-6):
    """Direct O(N^2) oracle of the fast_transformers causal-linear math."""
    pq, pk = la.feature_map(q), la.feature_map(k)
    scores = jnp.einsum("bhie,bhje->bhij", pq, pk)
    s = q.shape[2]
    mask = jnp.tril(jnp.ones((s, s)))
    scores = scores * mask
    num = jnp.einsum("bhij,bhjf->bhif", scores, v)
    den = jnp.sum(scores, axis=-1) + eps
    return num / den[..., None]


def make_qkv(key, b=2, h=3, s=67, e=16, f=16):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, s, e))
    k = jax.random.normal(k2, (b, h, s, e))
    v = jax.random.normal(k3, (b, h, s, f))
    return q, k, v


def test_xla_matches_naive():
    q, k, v = make_qkv(jax.random.PRNGKey(0))
    out = la.causal_linear_attention(q, k, v, chunk=16, backend="xla")
    np.testing.assert_allclose(out, naive(q, k, v), rtol=1e-4, atol=1e-4)


def test_xla_unaligned_lengths():
    for s in (1, 5, 16, 33):
        q, k, v = make_qkv(jax.random.PRNGKey(s), s=s)
        out = la.causal_linear_attention(q, k, v, chunk=16, backend="xla")
        np.testing.assert_allclose(out, naive(q, k, v), rtol=1e-4, atol=1e-4)


def test_pallas_interpret_matches_xla():
    q, k, v = make_qkv(jax.random.PRNGKey(1), s=64, e=8, f=8)
    with jax.disable_jit():  # interpret-friendly
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out_p = la.causal_linear_attention(q, k, v, chunk=16, backend="pallas")
    out_x = la.causal_linear_attention(q, k, v, chunk=16, backend="xla")
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_autodiff():
    q, k, v = make_qkv(jax.random.PRNGKey(2), b=1, h=2, s=37, e=8, f=8)

    def loss_custom(q, k, v):
        return jnp.sum(jnp.sin(la.causal_linear_attention(q, k, v, chunk=16, backend="xla")))

    def loss_naive(q, k, v):
        return jnp.sum(jnp.sin(naive(q, k, v)))

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g_n = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_c, g_n):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_interpret_backward():
    q, k, v = make_qkv(jax.random.PRNGKey(3), b=1, h=1, s=32, e=8, f=8)
    from jax.experimental.pallas import tpu as pltpu

    def loss(backend):
        def f(q, k, v):
            return jnp.sum(la.causal_linear_attention(q, k, v, chunk=16, backend=backend) ** 2)
        return f

    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    with jax.disable_jit():
        with pltpu.force_tpu_interpret_mode():
            g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_recurrent_step_matches_parallel():
    q, k, v = make_qkv(jax.random.PRNGKey(4), b=2, h=2, s=19, e=8, f=8)
    out_par = la.causal_linear_attention(q, k, v, chunk=8, backend="xla")

    state = la.init_attention_state(2, 2, 8, 8)
    outs = []
    for i in range(19):
        o, state = la.linear_attention_step(q[:, :, i], k[:, :, i], v[:, :, i], state)
        outs.append(o)
    out_rec = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(out_rec, out_par, rtol=1e-4, atol=1e-4)


def test_bshe_layout_matches_bhse():
    """causal_linear_attention_bshe == causal_linear_attention on
    transposed inputs/outputs, forward and all three gradients."""
    from reinforcement_learning_in_music_generation_tpu.ops.linear_attention import (
        causal_linear_attention, causal_linear_attention_bshe)
    B, H, S, E = 2, 3, 70, 16    # ragged S exercises the chunk padding
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    q = jax.random.normal(ks[0], (B, H, S, E))
    k = jax.random.normal(ks[1], (B, H, S, E))
    v = jax.random.normal(ks[2], (B, H, S, E))
    t = lambda x: jnp.transpose(x, (0, 2, 1, 3))

    ref = causal_linear_attention(q, k, v, backend="xla", chunk=32)
    got = causal_linear_attention_bshe(t(q), t(k), t(v), chunk=32)
    np.testing.assert_allclose(np.asarray(t(got)), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss_ref(q, k, v):
        o = causal_linear_attention(q, k, v, backend="xla", chunk=32)
        return jnp.sum(jnp.sin(o))

    def loss_bshe(q, k, v):
        o = causal_linear_attention_bshe(t(q), t(k), t(v), chunk=32)
        return jnp.sum(jnp.sin(t(o)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_bshe, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gr, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")
