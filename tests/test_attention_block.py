"""Fused qkv+attention training kernel (ops/attention_block.py) vs the XLA
composition (qkv matmul + causal_linear_attention_bshe), interpret mode.

The on-chip perf decision lives in scripts/profile_attention_block.py +
BENCH.md (round 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu.ops import (
    attention_block as ab)
from reinforcement_learning_in_music_generation_tpu.ops.linear_attention import (
    causal_linear_attention_bshe)

B, S, H, E = 3, 32, 4, 8
D = H * E
CHUNK = 8


def _inputs(dtype=jnp.float32):
    h = jax.random.normal(jax.random.PRNGKey(0), (B * S, D), dtype)
    w = (jax.random.normal(jax.random.PRNGKey(1), (D, 3 * D), dtype) * 0.2)
    b = jax.random.normal(jax.random.PRNGKey(2), (3 * D,), dtype) * 0.1
    return h, w, b


def _ref(h, w, b):
    qkv = h @ w + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shp = lambda x: x.reshape(B, S, H, E)
    att = causal_linear_attention_bshe(shp(q), shp(k), shp(v), chunk=CHUNK)
    return att.reshape(B * S, D)


def test_forward_matches_xla_composition():
    h, w, b = _inputs()
    got = ab.qkv_attention_block(h, w, b, B, H, chunk=CHUNK, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(h, w, b)),
                               rtol=1e-5, atol=1e-5)


def test_forward_single_chunk_and_single_pair():
    # one chunk per sequence, one head pair: exercises the degenerate grid
    h = jax.random.normal(jax.random.PRNGKey(3), (2 * 8, 16))
    w = jax.random.normal(jax.random.PRNGKey(4), (16, 48)) * 0.2
    b = jnp.zeros((48,))
    got = ab.qkv_attention_block(h, w, b, 2, 2, chunk=8, interpret=True)
    qkv = h @ w + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shp = lambda x: x.reshape(2, 8, 2, 8)
    ref = causal_linear_attention_bshe(shp(q), shp(k), shp(v),
                                       chunk=8).reshape(16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla_composition():
    h, w, b = _inputs()

    def loss_k(h, w, b):
        o = ab.qkv_attention_block(h, w, b, B, H, chunk=CHUNK,
                                   interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_r(h, w, b):
        return jnp.sum(jnp.sin(_ref(h, w, b)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(h, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(h, w, b)
    for name, a, r in zip(["dh", "dw", "db"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_sequences_are_independent():
    """The recurrent state must reset at each sequence's first chunk: the
    first sequence's output must not change when the other sequences'
    inputs do."""
    h, w, b = _inputs()
    out1 = ab.qkv_attention_block(h, w, b, B, H, chunk=CHUNK, interpret=True)
    h2 = h.at[S:].set(jax.random.normal(jax.random.PRNGKey(9),
                                        ((B - 1) * S, D)))
    out2 = ab.qkv_attention_block(h2, w, b, B, H, chunk=CHUNK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:S]), np.asarray(out2[:S]),
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(out1[S:]), np.asarray(out2[S:]))


def test_bf16_activations():
    h, w, b = _inputs(jnp.bfloat16)
    got = ab.qkv_attention_block(h, w, b, B, H, chunk=CHUNK, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _ref(h.astype(jnp.float32), w.astype(jnp.float32),
               b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_rejects_indivisible_chunk():
    h, w, b = _inputs()
    with pytest.raises(ValueError):
        ab.qkv_attention_block(h, w, b, B, H, chunk=7, interpret=True)


def test_full_forward_matches_with_pallas_qkv(monkeypatch):
    """Integrated path: RLMG_ATTN_BACKEND=pallas-qkv (interpret) matches
    the default XLA composition on the full tiny model, with and without
    the fused tail."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, attn_chunk=8)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 6), 0, 8)
    ref = lt.forward_hidden(params, cfg, x, deterministic=True)
    monkeypatch.setenv("RLMG_ATTN_BACKEND", "pallas-qkv")
    monkeypatch.setenv("RLMG_ATTN_INTERPRET", "1")
    got = lt.forward_hidden(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # with the fused tail as well (the production combination)
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    monkeypatch.setenv("RLMG_FFN_BLOCK", "32")
    got2 = lt.forward_hidden(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_train_losses_grads_with_pallas_qkv(monkeypatch):
    """value_and_grad through the integrated pallas-qkv path matches the
    XLA composition (dropout off: the paths draw different streams)."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, attn_chunk=8, dropout=0.0)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 6), 0, 8)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((2, 16), jnp.float32)

    def loss(p):
        return jnp.mean(lt.train_losses(p, cfg, x, y, mask,
                                        deterministic=False,
                                        rng=jax.random.PRNGKey(2)))

    ref_l, ref_g = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("RLMG_ATTN_BACKEND", "pallas-qkv")
    monkeypatch.setenv("RLMG_ATTN_INTERPRET", "1")
    got_l, got_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    for (kp, a), (_, r) in zip(
            jax.tree_util.tree_leaves_with_path(got_g),
            jax.tree_util.tree_leaves_with_path(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=jax.tree_util.keystr(kp))


def test_pallas_qkv_dp_mesh_matches_single_device(monkeypatch):
    """dp=8 virtual-mesh train step with pallas-qkv attention must match
    the single-device run: the opaque pallas_call has to run per batch
    shard under shard_map (GSPMD cannot partition it), weights
    replicated."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh, shard_batch, shard_params)
    from reinforcement_learning_in_music_generation_tpu.train import (
        agent_train_step, optim)

    monkeypatch.setenv("RLMG_ATTN_BACKEND", "pallas-qkv")
    monkeypatch.setenv("RLMG_ATTN_INTERPRET", "1")
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    monkeypatch.setenv("RLMG_FFN_BLOCK", "32")
    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, attn_chunk=8, dropout=0.0)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x, y, mask = dataset.synthetic_cp_dataset(8, 16, n_class=cfg.vocab_sizes)
    x, y = jnp.asarray(x), jnp.asarray(y)
    mask = jnp.asarray(mask, jnp.float32)
    tx = optim.adam(1e-4, grad_clip=3.0)

    _, _, (ref_loss, _) = agent_train_step(
        params, tx.init(params), cfg, tx, x, y, mask, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=8, tp=1)
    sp = shard_params(mesh, params)
    bx, by, bm = shard_batch(mesh, (x, y, mask))
    _, _, (dp_loss, _) = agent_train_step(
        sp, tx.init(sp), cfg, tx, bx, by, bm, jax.random.PRNGKey(1),
        dp_mesh=mesh)
    np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-5)


def test_pallas_qkv_tp_guard(monkeypatch):
    """tp>1 must fall back to the XLA attention (the qkv projections are
    tensor-sharded; the fused kernel would force an all-gather) — and the
    run must still produce the correct loss."""
    import warnings
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh, shard_batch, shard_params)
    from reinforcement_learning_in_music_generation_tpu.train import (
        agent_train_step, optim)

    monkeypatch.setenv("RLMG_ATTN_BACKEND", "pallas-qkv")
    monkeypatch.setenv("RLMG_ATTN_INTERPRET", "1")
    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=1,
        n_head=2, d_inner=64, attn_chunk=8, dropout=0.0)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x, y, mask = dataset.synthetic_cp_dataset(4, 16, n_class=cfg.vocab_sizes)
    x, y = jnp.asarray(x), jnp.asarray(y)
    mask = jnp.asarray(mask, jnp.float32)
    tx = optim.adam(1e-4, grad_clip=3.0)

    _, _, (ref_loss, _) = agent_train_step(
        params, tx.init(params), cfg, tx, x, y, mask, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=2, tp=2)
    sp = shard_params(mesh, params)
    bx, by, bm = shard_batch(mesh, (x, y, mask))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _, _, (tp_loss, _) = agent_train_step(
            sp, tx.init(sp), cfg, tx, bx, by, bm, jax.random.PRNGKey(1),
            dp_mesh=mesh)
        tp_loss = float(tp_loss)
    assert any("pallas-qkv" in str(w.message) for w in rec)
    np.testing.assert_allclose(tp_loss, float(ref_loss),
                               rtol=1e-5, atol=1e-5)


def test_pallas_qkv_indivisible_seq_falls_back(monkeypatch):
    """seq len not divisible by attn_chunk cannot tile the kernel grid —
    the dispatcher must fall back to XLA (which pads internally), not
    crash mid-trace."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=1,
        n_head=2, d_inner=64, attn_chunk=8, dropout=0.0)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 12, 6), 0, 8)  # 12 % 8 != 0
    ref = lt.forward_hidden(params, cfg, x, deterministic=True)
    monkeypatch.setenv("RLMG_ATTN_BACKEND", "pallas-qkv")
    monkeypatch.setenv("RLMG_ATTN_INTERPRET", "1")
    got = lt.forward_hidden(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
