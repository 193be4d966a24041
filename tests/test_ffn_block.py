"""Fused FFN-block kernel (ops/ffn_block.py) vs the XLA composition.

Interpret mode on the CPU suite; the on-chip perf decision lives in
scripts/profile_ffn_block.py + BENCH.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu.ops import ffn_block as fb

D, DI = 64, 256


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (D, DI), dtype) * 0.05
    b1 = jax.random.normal(ks[1], (DI,), dtype) * 0.05
    w2 = jax.random.normal(ks[2], (DI, D), dtype) * 0.05
    b2 = jax.random.normal(ks[3], (D,), dtype) * 0.05
    ls = jnp.ones((D,), dtype) * 1.1
    lb = jnp.full((D,), 0.3, dtype)
    return w1, b1, w2, b2, ls, lb


def _ref(h, w1, b1, w2, b2, ls, lb):
    y = jax.nn.gelu(h @ w1 + b1, approximate=False)
    y = y @ w2 + b2
    r = h + y
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    return (r - mu) * jax.lax.rsqrt(var + 1e-5) * ls + lb


def test_ffn_block_forward_matches_xla():
    h = jax.random.normal(jax.random.PRNGKey(0), (100, D))  # ragged rows
    args = _params(jax.random.PRNGKey(1))
    out = fb.ffn_block(h, *args, jnp.int32(0), 0.0, 32, True)
    ref = _ref(h, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_ffn_block_grads_match_xla():
    h = jax.random.normal(jax.random.PRNGKey(2), (64, D))
    args = _params(jax.random.PRNGKey(3))

    def loss_k(h, *a):
        o = fb.ffn_block(h, *a, 0.0, jnp.int32(0), 32, True)
        return jnp.sum(jnp.sin(o))

    def loss_r(h, *a):
        return jnp.sum(jnp.sin(_ref(h, *a)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5, 6))(h, *args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5, 6))(h, *args)
    names = ["dh", "dw1", "db1", "dw2", "db2", "dls", "dlb"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=n)


def test_ffn_block_dropout_masks_consistent():
    """Stochastic mode: same seed => gradient of sum(out) w.r.t. h equals
    the finite-difference slope along a random direction (masks must be
    the same in fwd and bwd for this to hold)."""
    try:
        h = jax.random.normal(jax.random.PRNGKey(4), (32, D))
        args = _params(jax.random.PRNGKey(5))
        p, seed = 0.3, jnp.int32(7)

        def f(h):
            return jnp.sum(fb.ffn_block(h, *args, seed, p, 32, True))

        v = jax.random.normal(jax.random.PRNGKey(6), h.shape) * 1e-3
        g = jax.grad(f)(h)
        lhs = float(jnp.vdot(g, v))
        rhs = float((f(h + v) - f(h - v)) / 2.0)
        assert abs(lhs - rhs) < 5e-3 * max(1.0, abs(rhs)), (lhs, rhs)
    except NotImplementedError as e:  # pragma: no cover
        import pytest
        pytest.skip(f"pallas PRNG not emulated in interpret mode: {e}")


def test_full_forward_matches_with_pallas_ffn(monkeypatch):
    """The integrated path: forward_hidden with RLMG_FFN_BACKEND=pallas
    (interpret) matches the XLA composition on the full tiny model."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 6), 0, 8)
    ref = lt.forward_hidden(params, cfg, x, deterministic=True)
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    got = lt.forward_hidden(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
