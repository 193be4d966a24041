"""v5 persistent decode kernel: CPU-testable math seams.

The pallas_call itself needs a real TPU (nested emit_pipeline has no
interpret mode); these tests cover the pure-jnp pieces the kernel is built
from: the sort-free nucleus threshold, the Gumbel-max sampler, the
embedding fold, and the state repacking.  On-chip greedy parity vs the XLA
path is checked by scripts/profile_decode_v5.py (results in BENCH.md).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np


pytestmark = pytest.mark.slow  # superseded v5 kernel (ops/experimental); run with -m "" or -m slow

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp
from reinforcement_learning_in_music_generation_tpu.ops.experimental import (
    decode_kernel_v5 as dk5)


def test_keep_threshold_matches_nucleus_mask():
    rng = np.random.default_rng(0)
    for trial in range(10):
        logits = rng.normal(size=(4, 37)).astype(np.float32)
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        for top_p in (0.5, 0.9, 0.99):
            keep = np.asarray(dk5.nucleus_keep_by_threshold(
                jnp.asarray(p), jnp.full((4, 1), top_p)))
            ref = np.asarray(smp.nucleus_mask(jnp.asarray(p), top_p))
            np.testing.assert_array_equal(keep, ref, err_msg=f"{trial} {top_p}")


def test_keep_threshold_inf_keeps_support():
    p = jnp.asarray([[0.5, 0.3, 0.2, 0.0]])
    keep = np.asarray(dk5.nucleus_keep_by_threshold(
        p, jnp.full((1, 1), jnp.inf)))
    np.testing.assert_array_equal(keep, [[True, True, True, False]])


def test_gumbel_max_samples_categorical():
    """argmax(logits + gumbel) over many draws ~ softmax frequencies."""
    logits = jnp.asarray([2.0, 1.0, 0.0, -1.0])
    n = 20000
    bits = jax.random.bits(jax.random.PRNGKey(0), (n, 4), jnp.uint32)
    g = dk5.gumbel_from_bits(bits)
    draws = np.asarray(jnp.argmax(logits[None] + g, axis=-1))
    freq = np.bincount(draws, minlength=4) / n
    ref = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(freq, ref, atol=0.015)


def test_argmax_first_matches_numpy():
    x = jnp.asarray([[1.0, 3.0, 3.0, 0.0], [5.0, 2.0, 5.0, 5.0]])
    got = np.asarray(dk5.argmax_first(x))[:, 0]
    np.testing.assert_array_equal(got, np.argmax(np.asarray(x), axis=-1))


def _cfg():
    return C.agent_config(n_layer=2, d_model=64, n_head=2, d_inner=128,
                          max_len=64)


def test_embedding_fold_matches_model():
    """one-hot @ M + b == scaled field embeddings -> in_linear."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    v5p = dk5.make_v5_params(params, cfg, dtype=jnp.float32)
    tok = jnp.asarray([[1, 2, 3, 4, 5, 6], [0, 0, 1, 0, 0, 0]], jnp.int32)

    ref = cm.linear(params["in_linear"], cm.embed_fields(params["emb"], tok))

    offs = np.concatenate([[0], np.cumsum(cfg.vocab_sizes)[:-1]])
    gid = np.asarray(tok) + offs[None]
    oh = np.zeros((2, v5p.memb.shape[0]), np.float32)
    for b in range(2):
        for f in range(6):
            oh[b, gid[b, f]] += 1.0
    got = jnp.asarray(oh) @ v5p.memb + v5p.binr[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_heads_pad_matches_model():
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(1), cfg)
    v5p = dk5.make_v5_params(params, cfg, dtype=jnp.float32)
    h = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.d_model))
    ref = lt.forward_output(params, cfg, h)
    got = h @ v5p.whp + v5p.bhp[0]
    for f, v in enumerate(cfg.vocab_sizes):
        np.testing.assert_allclose(
            np.asarray(got[:, f * dk5.VF_PAD:f * dk5.VF_PAD + v]),
            np.asarray(ref[f]), rtol=2e-4, atol=2e-4)
        pad = got[:, f * dk5.VF_PAD + v:(f + 1) * dk5.VF_PAD]
        assert np.all(np.asarray(pad) <= dk5.NEG / 2)


def test_pack_unpack_state_roundtrip():
    cfg = _cfg()
    st = lt.init_decode_state(cfg, 3)
    s = jax.random.normal(jax.random.PRNGKey(3), st.s.shape)
    z = jax.random.normal(jax.random.PRNGKey(4), st.z.shape)
    s5, z5 = dk5.pack_state(s, z)
    s2, z2 = dk5.unpack_state(s5, z5, cfg.n_head)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
