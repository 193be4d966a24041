"""v7 weight-resident latency decode kernel (ops/experimental/decode_kernel_v7).

Interpret-mode (TPU-interpret on CPU) parity vs the XLA recurrent path:
with f32 weights + f32 state the kernel is argmax-equivalent to
lt.decode_step, so greedy streams must match exactly on a small config.
On-chip latency A/B lives in scripts/profile_decode_latency.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops.experimental import (
    decode_kernel_v7 as dk7)

CFG = C.LinearTransformerConfig(
    vocab_sizes=(8, 10, 6, 12, 6, 7), emb_sizes=(8,) * 6,
    d_model=32, n_head=2, n_layer=2, d_inner=64, dropout=0.0,
    max_len=128, dtype="float32")
NAMES = cm.field_names(6)


def _setup(b=8, n_seed=4):
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    pe = cm.sinusoidal_table(CFG.max_len, CFG.d_model, jnp.float32)
    v7p = dk7.make_v7_params(params, CFG, pe, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    toks = jnp.stack(
        [jax.random.randint(jax.random.fold_in(rng, f), (b, n_seed), 0, v)
         for f, v in enumerate(CFG.vocab_sizes)], axis=-1)
    st = lt.init_decode_state(CFG, b)
    for i in range(n_seed - 1):
        _, st = lt.decode_step(params, CFG, toks[:, i], st, pe_table=pe)
    s4, z4 = dk7.pack_state_pair(st.s.astype(jnp.float32),
                                 st.z.astype(jnp.float32))
    return params, pe, v7p, toks, st, s4, z4


def _xla_greedy(params, pe, st, tok0, n):
    """Greedy continuation through lt.decode_step (returns (n, B, nf))."""
    out, tok = [], tok0
    for _ in range(n):
        h, st = lt.decode_step(params, CFG, tok, st, pe_table=pe)
        tok = jnp.stack(
            [jnp.argmax(cm.linear(params["heads"][f], h), -1)
             for f in NAMES], -1)
        out.append(np.asarray(tok))
    return np.stack(out, 0), st


def test_state_pack_round_trip():
    s = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 4, 8, 8))
    z = jax.random.normal(jax.random.PRNGKey(3), (3, 5, 4, 8))
    s4, z4 = dk7.pack_state_pair(s, z)
    assert s4.shape == (3, 2, 5, 8, 16) and z4.shape == (3, 2, 5, 16)
    s2, z2 = dk7.unpack_state_pair(s4, z4)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))


@pytest.mark.slow
def test_greedy_stream_matches_xla():
    params, pe, v7p, toks, st, s4, z4 = _setup()
    tok0 = toks[:, -1]
    T = 8
    with pltpu.force_tpu_interpret_mode():
        toksT, s_out, z_out = dk7.fused_decode_v7(
            v7p, tok0.astype(jnp.int32).T, s4, z4, jnp.int32(3),
            jnp.int32(42), n_head=CFG.n_head, max_tokens=T,
            vocab_sizes=CFG.vocab_sizes, temps=(1.0,) * 6,
            topps=(float("inf"),) * 6, greedy=True)
    ref, st_ref = _xla_greedy(params, pe, st, tok0, T)
    np.testing.assert_array_equal(
        np.asarray(toksT).transpose(0, 2, 1), ref)
    # state continuity: the kernel feeds tok0 + the first T-1 emitted
    # tokens — exactly what the XLA loop above fed over its T iterations
    # (the T-th emitted token is sampled but not fed on either side)
    s4_ref, z4_ref = dk7.pack_state_pair(
        st_ref.s.astype(jnp.float32), st_ref.z.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s4_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_out), np.asarray(z4_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # experimental kernel (negative A/B, BENCH.md r5); fast greedy/stochastic coverage remains
def test_chunk_invariance():
    params, pe, v7p, toks, st, s4, z4 = _setup()
    tok0T = toks[:, -1].astype(jnp.int32).T
    kw = dict(n_head=CFG.n_head, vocab_sizes=CFG.vocab_sizes,
              temps=(1.0,) * 6, topps=(float("inf"),) * 6, greedy=True)
    with pltpu.force_tpu_interpret_mode():
        one, _, _ = dk7.fused_decode_v7(
            v7p, tok0T, s4, z4, jnp.int32(3), jnp.int32(7),
            max_tokens=8, **kw)
        a, s_m, z_m = dk7.fused_decode_v7(
            v7p, tok0T, s4, z4, jnp.int32(3), jnp.int32(7),
            max_tokens=4, **kw)
        b, _, _ = dk7.fused_decode_v7(
            v7p, a[-1], s_m, z_m, jnp.int32(7), jnp.int32(7),
            max_tokens=4, **kw)
    np.testing.assert_array_equal(
        np.asarray(one), np.concatenate([np.asarray(a), np.asarray(b)], 0))


def test_stochastic_tokens_in_range():
    params, pe, v7p, toks, st, s4, z4 = _setup()
    with pltpu.force_tpu_interpret_mode():
        toksT, _, _ = dk7.fused_decode_v7(
            v7p, toks[:, -1].astype(jnp.int32).T, s4, z4, jnp.int32(3),
            jnp.int32(123), n_head=CFG.n_head, max_tokens=6,
            vocab_sizes=CFG.vocab_sizes,
            temps=(1.2, 1.0, 1.2, 1.0, 2.0, 5.0),
            topps=(0.9, 0.99, float("inf"), 0.9, 0.9, float("inf")),
            greedy=False)
    t = np.asarray(toksT)                     # (T, nf, B)
    for f, v in enumerate(CFG.vocab_sizes):
        assert t[:, f, :].min() >= 0 and t[:, f, :].max() < v, (f, v)


def test_generate_tokens_latency_end_to_end():
    """Wrapper path on CPU interpret: padding 5 -> 8 songs, bar-stop
    semantics, greedy stream equals generate_tokens' XLA scan result."""
    from reinforcement_learning_in_music_generation_tpu.generate import (
        sampler)
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None],
                    (5, 1, 1))
    with pltpu.force_tpu_interpret_mode():
        res = sampler.generate_tokens_latency(
            params, CFG, jax.random.PRNGKey(9), init, max_tokens=12,
            bar_cond=3, greedy=True, chunk=6)
    ref = sampler.generate_tokens(
        params, CFG, jax.random.PRNGKey(9), init, max_tokens=12,
        bar_cond=3, greedy=True, fused=False, fused_sampling=False)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(res.n_bars),
                                  np.asarray(ref.n_bars))
