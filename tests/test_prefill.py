"""Parallel prompt prefill (models/linear_transformer.py:forward_prefill)
vs the sequential decode_step scan, and its sampler integration.

The reference re-runs the FULL prefix through the parallel model for
every generated token (ppo_policy/inference.py:101-134); the framework's
recurrent decode already avoids that, and prefill replaces the remaining
sequential prompt scan with one parallel forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)

CFG = C.LinearTransformerConfig(
    vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=3,
    n_head=4, d_inner=64, attn_chunk=8)


def _scan_state(params, cfg, x):
    state = lt.init_decode_state(cfg, x.shape[0])
    h = jnp.zeros((x.shape[0], cfg.d_model))
    for i in range(x.shape[1]):
        h, state = lt.decode_step(params, cfg, x[:, i], state)
    return h, state


def test_prefill_matches_decode_scan():
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 21, 6), 0, 8)
    h_ref, st_ref = _scan_state(params, CFG, x)

    tb = lt.prefill_bucket(21, 16)
    assert tb == 32
    xp = jnp.pad(x, ((0, 0), (0, tb - 21), (0, 0)))
    h, st = lt.forward_prefill(params, CFG, xp, 21)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.s), np.asarray(st_ref.s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.z), np.asarray(st_ref.z),
                               rtol=2e-5, atol=2e-5)
    assert int(st.step) == 21


def test_prefill_unpadded_default_n_valid():
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.randint(jax.random.PRNGKey(2), (1, 16, 6), 0, 8)
    h_ref, st_ref = _scan_state(params, CFG, x)
    h, st = lt.forward_prefill(params, CFG, x)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.s), np.asarray(st_ref.s),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_generate_tokens_prefill_consistent(monkeypatch):
    """Stochastic generation from a long prompt: the prefill-seeded and
    scan-seeded runs draw the same tokens (f32 states differ only at
    ~1e-7, far from any sampling tie at this scale)."""
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 20, 6), 0, 8)
    settings = tuple(
        sampler.smp.FieldSampling(1.0, None) for _ in range(6))

    monkeypatch.setenv("RLMG_PREFILL", "0")
    ref = sampler.generate_tokens(
        params, CFG, jax.random.PRNGKey(4), prompt, max_tokens=8,
        settings=settings)
    monkeypatch.delenv("RLMG_PREFILL")
    jax.clear_caches()   # the env is read at trace time
    got = sampler.generate_tokens(
        params, CFG, jax.random.PRNGKey(4), prompt, max_tokens=8,
        settings=settings)
    assert (np.asarray(got.tokens) == np.asarray(ref.tokens)).all()


def test_seed_state_prefill_matches_scan(monkeypatch):
    """The v6/v7 chunked-path seeding helper picks prefill above the
    length threshold and produces the same packed state."""
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.randint(jax.random.PRNGKey(5), (2, 18, 6), 0, 8)
    state = lt.init_decode_state(CFG, 2)
    pe = None
    from reinforcement_learning_in_music_generation_tpu.models import (
        common as cm)
    pe = cm.sinusoidal_table(CFG.max_len, CFG.d_model, jnp.float32)

    monkeypatch.setenv("RLMG_PREFILL", "0")
    ref = sampler._seed_state(params, CFG, x, state, pe, jnp.float32)
    monkeypatch.delenv("RLMG_PREFILL")
    monkeypatch.setenv("RLMG_PREFILL_MIN", "8")
    got = sampler._seed_state(params, CFG, x, state, pe, jnp.float32)
    np.testing.assert_allclose(np.asarray(got.s), np.asarray(ref.s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               rtol=2e-5, atol=2e-5)
    assert int(got.step) == int(ref.step)


def test_seed_fn_bucket_padding_matches_exact(monkeypatch):
    """The chunked-path seed fn accepts a bucket-padded prompt plus
    n_valid and must produce the same packed state as the exact-length
    call (serving compiles one seed program per 64-token bucket)."""
    monkeypatch.setenv("RLMG_PREFILL_MIN", "8")
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.randint(jax.random.PRNGKey(6), (2, 18, 6), 0, 8)
    state = lt.init_decode_state(CFG, 2)
    fn = sampler._persistent_seed_fn(CFG, "float32", "float32")
    st_a, s6a, z6a = fn(params, x, state, None)

    tb = lt.prefill_bucket(18)
    xp = jnp.pad(x, ((0, 0), (0, tb - 18), (0, 0)))
    st_b, s6b, z6b = fn(params, xp, state, jnp.asarray(18, jnp.int32))
    np.testing.assert_allclose(np.asarray(s6b), np.asarray(s6a),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z6b), np.asarray(z6a),
                               rtol=2e-5, atol=2e-5)
    assert int(st_b.step) == int(st_a.step) == 18


def test_generate_songs_bucketed_prompt_matches_unbucketed(monkeypatch):
    """generate_songs pads long prompts to a 64-token bucket before the
    per-step path; songs must match the unpadded (prefill-off) run and
    contain the full real prompt with no pad rows."""
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (20, 6), 0, 8))
    gcfg = C.GenerateConfig(n_songs=2, bar_production=None, token_count=12,
                            max_tokens=12, greedy=False, batch_size=2,
                            seed=11)

    monkeypatch.setenv("RLMG_PREFILL", "0")
    ref = sampler.generate_songs(params, CFG, gcfg, init=prompt)
    monkeypatch.delenv("RLMG_PREFILL")
    jax.clear_caches()
    got = sampler.generate_songs(params, CFG, gcfg, init=prompt)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert (g == r).all()
        assert (g[:20] == prompt).all()


@pytest.mark.slow
def test_generate_tokens_fused_prefill_interpret(monkeypatch):
    """Prefill + the fused v4 per-step path (the production small-batch
    serving combination on TPU): interpret-mode tokens match the
    scan-seeded run (f32 weights + f32 state, like the v4 parity test)."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("RLMG_DECODE_STATE_DTYPE", "float32")
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(8), (2, 20, 6), 0, 8)
    settings = tuple(
        sampler.smp.FieldSampling(1.0, None) for _ in range(6))

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("RLMG_PREFILL", "0")
        ref = sampler.generate_tokens(
            params, CFG, jax.random.PRNGKey(9), prompt, max_tokens=6,
            settings=settings, fused=True)
        monkeypatch.delenv("RLMG_PREFILL")
        jax.clear_caches()
        got = sampler.generate_tokens(
            params, CFG, jax.random.PRNGKey(9), prompt, max_tokens=6,
            settings=settings, fused=True)
    assert (np.asarray(got.tokens) == np.asarray(ref.tokens)).all()
