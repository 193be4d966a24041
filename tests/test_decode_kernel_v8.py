"""v8 one-program-per-token latency decode kernel
(ops/experimental/decode_kernel_v8 — quarantined after the r5 negative
on-chip A/B; parity coverage stays because the kernel remains reachable
via RLMG_LATENCY_KERNEL / generate_tokens_latency).

Interpret-mode (TPU-interpret on CPU) parity vs the XLA recurrent path:
with f32 weights + f32 state the kernel is argmax-equivalent to
lt.decode_step, so greedy streams must match exactly on a small config.
The in-kernel fori_loop over layer slabs must also be chunk-invariant
and hand back a state identical to the per-layer-grid v7 formulation.
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
    decode_kernel_v8 as dk8)

CFG = C.LinearTransformerConfig(
    vocab_sizes=(8, 10, 6, 12, 6, 7), emb_sizes=(8,) * 6,
    d_model=32, n_head=2, n_layer=2, d_inner=64, dropout=0.0,
    max_len=128, dtype="float32")
NAMES = cm.field_names(6)


def _setup(b=8, n_seed=4):
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    pe = cm.sinusoidal_table(CFG.max_len, CFG.d_model, jnp.float32)
    rp = dk8.make_resident_params(params, CFG, pe, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    toks = jnp.stack(
        [jax.random.randint(jax.random.fold_in(rng, f), (b, n_seed), 0, v)
         for f, v in enumerate(CFG.vocab_sizes)], axis=-1)
    st = lt.init_decode_state(CFG, b)
    for i in range(n_seed - 1):
        _, st = lt.decode_step(params, CFG, toks[:, i], st, pe_table=pe)
    s4, z4 = dk8.pack_state_pair(st.s.astype(jnp.float32),
                                 st.z.astype(jnp.float32))
    return params, pe, rp, toks, st, s4, z4


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


def test_greedy_stream_matches_xla():
    params, pe, rp, toks, st, s4, z4 = _setup()
    tok0 = toks[:, -1]
    T = 6
    with pltpu.force_tpu_interpret_mode():
        toksT, s_out, z_out = dk8.fused_decode_v8(
            rp, tok0.astype(jnp.int32).T, s4, z4, jnp.int32(3),
            jnp.int32(42), n_head=CFG.n_head, max_tokens=T,
            vocab_sizes=CFG.vocab_sizes, temps=(1.0,) * 6,
            topps=(float("inf"),) * 6, greedy=True)
    ref, st_ref = _xla_greedy(params, pe, st, tok0, T)
    np.testing.assert_array_equal(
        np.asarray(toksT).transpose(0, 2, 1), ref)
    # state continuity: the kernel feeds tok0 + the first T-1 emitted
    # tokens — exactly what the XLA loop above fed over its T iterations
    s4_ref, z4_ref = dk8.pack_state_pair(
        st_ref.s.astype(jnp.float32), st_ref.z.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s4_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_out), np.asarray(z4_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # experimental kernel (negative A/B, BENCH.md r5); fast greedy/stochastic coverage remains
def test_chunk_invariance():
    params, pe, rp, toks, st, s4, z4 = _setup()
    tok0T = toks[:, -1].astype(jnp.int32).T
    kw = dict(n_head=CFG.n_head, vocab_sizes=CFG.vocab_sizes,
              temps=(1.0,) * 6, topps=(float("inf"),) * 6, greedy=True)
    with pltpu.force_tpu_interpret_mode():
        one, _, _ = dk8.fused_decode_v8(
            rp, tok0T, s4, z4, jnp.int32(3), jnp.int32(7),
            max_tokens=8, **kw)
        a, s_m, z_m = dk8.fused_decode_v8(
            rp, tok0T, s4, z4, jnp.int32(3), jnp.int32(7),
            max_tokens=4, **kw)
        b, _, _ = dk8.fused_decode_v8(
            rp, a[-1], s_m, z_m, jnp.int32(7), jnp.int32(7),
            max_tokens=4, **kw)
    np.testing.assert_array_equal(
        np.asarray(one), np.concatenate([np.asarray(a), np.asarray(b)], 0))


def test_stochastic_tokens_in_range():
    params, pe, rp, toks, st, s4, z4 = _setup()
    with pltpu.force_tpu_interpret_mode():
        toksT, _, _ = dk8.fused_decode_v8(
            rp, toks[:, -1].astype(jnp.int32).T, s4, z4, jnp.int32(3),
            jnp.int32(123), n_head=CFG.n_head, max_tokens=6,
            vocab_sizes=CFG.vocab_sizes,
            temps=(1.2, 1.0, 1.2, 1.0, 2.0, 5.0),
            topps=(0.9, 0.99, float("inf"), 0.9, 0.9, float("inf")),
            greedy=False)
    t = np.asarray(toksT)                     # (T, nf, B)
    for f, v in enumerate(CFG.vocab_sizes):
        assert t[:, f, :].min() >= 0 and t[:, f, :].max() < v, (f, v)


@pytest.mark.slow
def test_v8_matches_v7_greedy():
    """Same resident params + state through both formulations: the layer
    fori_loop (v8) must reproduce the per-layer-grid (v7) greedy stream
    and final state bit-for-bit in f32 interpret mode."""
    from reinforcement_learning_in_music_generation_tpu.ops.experimental import (
        decode_kernel_v7 as dk7)
    params, pe, rp, toks, st, s4, z4 = _setup()
    tok0T = toks[:, -1].astype(jnp.int32).T
    kw = dict(n_head=CFG.n_head, max_tokens=6,
              vocab_sizes=CFG.vocab_sizes, temps=(1.0,) * 6,
              topps=(float("inf"),) * 6, greedy=True)
    with pltpu.force_tpu_interpret_mode():
        t8, s8, z8 = dk8.fused_decode_v8(
            rp, tok0T, s4, z4, jnp.int32(3), jnp.int32(5), **kw)
        t7, s7, z7 = dk7.fused_decode_v7(
            rp, tok0T, s4, z4, jnp.int32(3), jnp.int32(5), **kw)
    np.testing.assert_array_equal(np.asarray(t8), np.asarray(t7))
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s7),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z8), np.asarray(z7),
                               rtol=1e-6, atol=1e-6)


def test_generate_tokens_latency_dispatches_v8(monkeypatch):
    """Wrapper path on CPU interpret: RLMG_LATENCY_KERNEL default is v8;
    padding 5 -> 8 songs, bar-stop semantics, greedy stream equals
    generate_tokens' XLA scan result."""
    from reinforcement_learning_in_music_generation_tpu.generate import (
        sampler)
    monkeypatch.delenv("RLMG_LATENCY_KERNEL", raising=False)
    assert sampler.latency_kernel_version() == "v8"
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
