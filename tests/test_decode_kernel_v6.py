"""v6 transposed-network decode kernel: CPU-testable math seams.

The pallas_call needs a real TPU (nested emit_pipeline, on-core PRNG);
these tests cover the host-side packing and the pure-jnp pieces: the
transposed weight/embedding folds, state repacking, the sublane-axis
nucleus threshold and argmax.  On-chip greedy parity vs the XLA path is
checked by scripts/profile_decode_v6.py (results in BENCH.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import (
    decode_kernel_v6 as dk6, sampling as smp)


def _cfg():
    return C.agent_config(n_layer=2, d_model=64, n_head=2, d_inner=128,
                          max_len=64)


def _v6p(cfg, key=0):
    params = lt.init_params(jax.random.PRNGKey(key), cfg)
    pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
    return params, dk6.make_v6_params(params, cfg, pe, dtype=jnp.float32)


def test_pack_unpack_state_v6_roundtrip():
    cfg = _cfg()
    st = lt.init_decode_state(cfg, 3)
    s = jax.random.normal(jax.random.PRNGKey(1), st.s.shape)
    z = jax.random.normal(jax.random.PRNGKey(2), st.z.shape)
    s6, z6 = dk6.pack_state_v6(s, z)
    s2, z2 = dk6.unpack_state_v6(s6, z6, cfg.n_head)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))


def test_v6_state_layout_semantics():
    """s6[l, i*E+j, u, b] == S[l, b, i, j, u]."""
    cfg = _cfg()
    e, h = cfg.d_head, cfg.n_head
    st = lt.init_decode_state(cfg, 2)
    s = jax.random.normal(jax.random.PRNGKey(3), st.s.shape)
    s6, _ = dk6.pack_state_v6(s, st.z)
    s_np, s6_np = np.asarray(s), np.asarray(s6)
    for l in (0, 1):
        for b in (0, 1):
            for i in range(h):
                for j in (0, e - 1):
                    np.testing.assert_array_equal(
                        s6_np[l, i * e + j, :, b], s_np[l, b, i, j, :])


def test_embedding_fold_transposed_matches_model():
    """membT @ onehotT + binr col == (embed_fields -> in_linear)^T."""
    cfg = _cfg()
    params, v6p = _v6p(cfg)
    tok = jnp.asarray([[1, 2, 3, 4, 5, 6], [0, 0, 1, 0, 0, 0]], jnp.int32)
    ref = cm.linear(params["in_linear"], cm.embed_fields(params["emb"], tok))

    offs = np.concatenate([[0], np.cumsum(cfg.vocab_sizes)[:-1]])
    gid = np.asarray(tok) + offs[None]
    vpad = v6p.membT.shape[1]
    ohT = np.zeros((vpad, 2), np.float32)
    for b in range(2):
        for f in range(cfg.n_fields):
            ohT[gid[b, f], b] += 1.0
    got = (np.asarray(v6p.membT) @ ohT
           + np.asarray(v6p.binrT)[:, :1])                  # (D, B)
    np.testing.assert_allclose(got.T, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_heads_transposed_matches_model():
    cfg = _cfg()
    params, v6p = _v6p(cfg, key=1)
    h = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.d_model))
    ref = lt.forward_output(params, cfg, h)
    got = (np.asarray(v6p.whpT) @ np.asarray(h).T
           + np.asarray(v6p.bhpT)[:, :1])                   # (NF*VF_PAD, B)
    for f, v in enumerate(cfg.vocab_sizes):
        np.testing.assert_allclose(
            got[f * dk6.VF_PAD:f * dk6.VF_PAD + v, :].T,
            np.asarray(ref[f]), rtol=2e-4, atol=2e-4)
        pad = got[f * dk6.VF_PAD + v:(f + 1) * dk6.VF_PAD, :]
        assert np.all(pad <= dk6.NEG / 2)


def test_transposed_weights_match():
    cfg = _cfg()
    params, v6p = _v6p(cfg)
    lp = params["layers"]
    qkvw = np.concatenate([np.asarray(lp["wq"]["w"]),
                           np.asarray(lp["wk"]["w"]),
                           np.asarray(lp["wv"]["w"])], axis=-1)
    np.testing.assert_allclose(np.asarray(v6p.qkvwT),
                               qkvw.swapaxes(-1, -2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v6p.f1wT),
                               np.asarray(lp["ffn1"]["w"]).swapaxes(-1, -2),
                               rtol=1e-6)
    # bias slabs are 128-lane-replicated columns
    assert v6p.qkvbT.shape[-1] == 128
    np.testing.assert_array_equal(np.asarray(v6p.qkvbT[..., 0]),
                                  np.asarray(v6p.qkvbT[..., 127]))


def test_lnT_matches_layernorm():
    cfg = _cfg()
    params, _ = _v6p(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, cfg.d_model))
    ref = cm.layernorm(params["final_ln"], x)
    sT = np.asarray(params["final_ln"]["scale"])[:, None]
    bT = np.asarray(params["final_ln"]["bias"])[:, None]
    got = dk6._lnT(jnp.asarray(np.asarray(x).T), jnp.asarray(sT),
                   jnp.asarray(bT))
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nucleus_keep_sub_matches_mask():
    rng = np.random.default_rng(0)
    for top_p in (0.5, 0.9, 0.99):
        logits = rng.normal(size=(3, 37, 5)).astype(np.float32)
        p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        keep = np.asarray(dk6.nucleus_keep_sub(
            jnp.asarray(p), jnp.full((3, 1, 1), top_p)))
        for f in range(3):
            for b in range(5):
                ref = np.asarray(smp.nucleus_mask(
                    jnp.asarray(p[f, :, b][None]), top_p))[0]
                np.testing.assert_array_equal(keep[f, :, b], ref,
                                              err_msg=f"{f} {b} {top_p}")


def test_argmax_first_sub_matches_numpy():
    x = np.asarray([[[1.0, 5.0], [3.0, 2.0], [3.0, 5.0], [0.0, 1.0]]])
    got = np.asarray(dk6.argmax_first_sub(jnp.asarray(x)))[:, 0, :]
    np.testing.assert_array_equal(got, np.argmax(x, axis=1))


def test_generate_tokens_persistent_posthoc_mask_semantics():
    """The post-hoc bar/validity math equals the scan path's step logic
    on a synthetic token stream (no kernel involved)."""
    bar_f, bar_id, bar_cond = 2, 1, 3
    B, T, nf = 2, 8, 6
    rng = np.random.default_rng(7)
    toks = rng.integers(2, 5, size=(B, T, nf)).astype(np.int32)
    # song 0 emits bars at steps 1, 3, 5 -> done after step 5
    for t in (1, 3, 5):
        toks[0, t, bar_f] = bar_id
    # song 1 never reaches bar_cond
    toks[1, 0, bar_f] = bar_id
    init_bars = np.zeros(B, np.int32)

    # scan-path reference
    bars = init_bars.copy()
    done = bars >= bar_cond
    valid_ref = np.zeros((B, T), bool)
    for t in range(T):
        tok = toks[:, t, :].copy()
        tok[done] = 0
        is_bar = (tok[:, bar_f] == bar_id) & ~done
        bars = bars + is_bar
        valid_ref[:, t] = ~done
        done = done | (bars >= bar_cond)

    # post-hoc math (sampler.generate_tokens_persistent)
    is_bar = toks[..., bar_f] == bar_id
    bars_after = init_bars[:, None] + np.cumsum(is_bar, axis=1)
    bars_before = bars_after - is_bar
    valid = bars_before < bar_cond
    n_bars = np.minimum(bars_after[:, -1],
                        np.maximum(init_bars, bar_cond))

    np.testing.assert_array_equal(valid, valid_ref)
    np.testing.assert_array_equal(n_bars, bars)
