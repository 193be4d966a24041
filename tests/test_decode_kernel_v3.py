"""v3 fused whole-step decode kernel: parity vs the scan decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import (
    decode_kernel_v3 as dk3)

CFG = C.LinearTransformerConfig(
    vocab_sizes=(8, 8, 8, 8, 8, 8), emb_sizes=(8,) * 6,
    d_model=32, n_layer=3, n_head=2, d_inner=64)


@pytest.mark.slow
def test_v3_matches_decode_step_interpret():
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    v3p = dk3.make_v3_params(params, CFG, dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 8, size=(6, b, 6)).astype(np.int32)

    state_ref = lt.init_decode_state(CFG, b)
    s_aug = dk3.init_aug_state(CFG, b)
    state_v3 = lt.DecodeState(s_aug, state_ref.z, state_ref.step)

    for t in range(toks.shape[0]):
        tok = jnp.asarray(toks[t])
        h_ref, state_ref = lt.decode_step(params, CFG, tok, state_ref)
        h_v3, state_v3 = dk3.decode_step_v3(params, v3p, CFG, tok, state_v3,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(h_v3), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-5)

    # state parity: v3 aug state vs (s, z)
    s_v3 = np.asarray(state_v3.s)            # (L, H, B, E, E+1)
    s_ref = np.asarray(state_ref.s)          # (L, B, H, E, E)
    z_ref = np.asarray(state_ref.z)          # (L, B, H, E)
    np.testing.assert_allclose(s_v3[..., :-1],
                               s_ref.transpose(0, 2, 1, 3, 4),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_v3[..., -1],
                               z_ref.transpose(0, 2, 1, 3),
                               rtol=1e-4, atol=1e-5)


def test_v3_small_parity_fast():
    """Tiny always-on v3 parity (ADVICE r4 #1): decode_step_v3 is the live
    fused fallback when n_head is odd (sampler.generate_tokens dispatch),
    so the default suite must keep SOME coverage of it; the full-shape
    rollout + state-parity check stays in the slow test above."""
    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8, 8, 8, 8, 8, 8), emb_sizes=(8,) * 6,
        d_model=32, n_layer=1, n_head=2, d_inner=32)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    v3p = dk3.make_v3_params(params, cfg, dtype=jnp.float32)
    b = 2
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 8, size=(2, b, 6)).astype(np.int32)

    state_ref = lt.init_decode_state(cfg, b)
    s_aug = dk3.init_aug_state(cfg, b)
    state_v3 = lt.DecodeState(s_aug, state_ref.z, state_ref.step)
    for t in range(toks.shape[0]):
        tok = jnp.asarray(toks[t])
        h_ref, state_ref = lt.decode_step(params, cfg, tok, state_ref)
        h_v3, state_v3 = dk3.decode_step_v3(params, v3p, cfg, tok, state_v3,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(h_v3), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-5)


def test_v4_matches_decode_step_interpret():
    from reinforcement_learning_in_music_generation_tpu.ops import (
        decode_kernel_v4 as dk4)

    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    v4p = dk4.make_v4_params(params, CFG, dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 8, size=(6, b, 6)).astype(np.int32)

    state_ref = lt.init_decode_state(CFG, b)
    # float32 state: this test asserts tight numeric parity of the kernel
    # math itself (the default storage dtype is bfloat16, decode_common.py)
    state_v4 = dk4.init_pair_state(CFG, b, dtype=jnp.float32)
    for t in range(toks.shape[0]):
        tok = jnp.asarray(toks[t])
        h_ref, state_ref = lt.decode_step(params, CFG, tok, state_ref)
        h_v4, state_v4 = dk4.decode_step_v4(params, v4p, CFG, tok, state_v4,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(h_v4), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-5)

    # state parity: v4 pair-packed s/z vs reference (L, B, H, E, E)/(L, B, H, E)
    L, P = CFG.n_layer, CFG.n_head // 2
    e = CFG.d_head
    s_v4 = np.asarray(state_v4.s).reshape(L, P, b, e, 2, e)
    s_v4 = s_v4.transpose(0, 2, 1, 4, 3, 5).reshape(L, b, CFG.n_head, e, e)
    np.testing.assert_allclose(s_v4, np.asarray(state_ref.s),
                               rtol=1e-4, atol=1e-5)
    z_v4 = np.asarray(state_v4.z).reshape(L, P, b, 2, e)
    z_v4 = z_v4.transpose(0, 2, 1, 3, 4).reshape(L, b, CFG.n_head, e)
    np.testing.assert_allclose(z_v4, np.asarray(state_ref.z),
                               rtol=1e-4, atol=1e-5)


def test_erf_poly_is_f32_exact():
    from reinforcement_learning_in_music_generation_tpu.ops.decode_kernel_v3 import _erf
    x = jnp.linspace(-5, 5, 4001)
    err = jnp.max(jnp.abs(_erf(x) - jax.lax.erf(x)))
    # 1.5e-7 analytic bound + f32 rounding => ~4e-7 measured
    assert float(err) <= 1e-6, float(err)


def test_v4_bf16_state_tracks_f32_interpret():
    """RLMG_DECODE_STATE_DTYPE=bfloat16 path: accumulation stays f32 in the
    kernel, only the stored state is rounded — hidden outputs must track
    the f32-state run within bf16 rounding noise over a short rollout."""
    from reinforcement_learning_in_music_generation_tpu.ops import (
        decode_kernel_v4 as dk4)

    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    v4p = dk4.make_v4_params(params, CFG, dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 8, size=(6, b, 6)).astype(np.int32)

    st32 = dk4.init_pair_state(CFG, b, dtype=jnp.float32)
    st16 = dk4.init_pair_state(CFG, b, dtype=jnp.bfloat16)
    assert st16.s.dtype == jnp.bfloat16
    for t in range(toks.shape[0]):
        tok = jnp.asarray(toks[t])
        h32, st32 = dk4.decode_step_v4(params, v4p, CFG, tok, st32,
                                       interpret=True)
        h16, st16 = dk4.decode_step_v4(params, v4p, CFG, tok, st16,
                                       interpret=True)
        assert st16.s.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(h16), np.asarray(h32),
                                   rtol=0.05, atol=0.05)
