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


def _tail_params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    wow = jax.random.normal(ks[0], (D, D), dtype) * 0.05
    wob = jax.random.normal(ks[1], (D,), dtype) * 0.05
    l1s = jnp.full((D,), 0.9, dtype)
    l1b = jnp.full((D,), -0.2, dtype)
    return (wow, wob, l1s, l1b) + _params(ks[2])


def _tail_ref(h_in, a_pre, wow, wob, l1s, l1b, w1, b1, w2, b2, l2s, l2b):
    a = a_pre @ wow + wob
    r1 = h_in + a
    mu = jnp.mean(r1, axis=-1, keepdims=True)
    var = jnp.mean((r1 - mu) ** 2, axis=-1, keepdims=True)
    h1 = (r1 - mu) * jax.lax.rsqrt(var + 1e-5) * l1s + l1b
    return _ref(h1, w1, b1, w2, b2, l2s, l2b)


def test_attn_tail_forward_matches_xla():
    h = jax.random.normal(jax.random.PRNGKey(10), (100, D))
    a = jax.random.normal(jax.random.PRNGKey(11), (100, D))
    wow, wob, l1s, l1b, w1, b1, w2, b2, l2s, l2b = _tail_params(
        jax.random.PRNGKey(12))
    out = fb.attn_tail_block(h, a, wow, wob, l1s, l1b, w1, b1, w2, b2,
                             l2s, l2b, jnp.int32(0), 0.0, 32, True)
    ref = _tail_ref(h, a, wow, wob, l1s, l1b, w1, b1, w2, b2, l2s, l2b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_attn_tail_grads_match_xla():
    h = jax.random.normal(jax.random.PRNGKey(13), (64, D))
    a = jax.random.normal(jax.random.PRNGKey(14), (64, D))
    args = _tail_params(jax.random.PRNGKey(15))
    argnums = tuple(range(12))

    def loss_k(h, a, *w):
        o = fb.attn_tail_block(h, a, *w, jnp.int32(0), 0.0, 32, True)
        return jnp.sum(jnp.sin(o))

    def loss_r(h, a, *w):
        return jnp.sum(jnp.sin(_tail_ref(h, a, *w)))

    gk = jax.grad(loss_k, argnums=argnums)(h, a, *args)
    gr = jax.grad(loss_r, argnums=argnums)(h, a, *args)
    names = ["dh", "dap", "dwow", "dwob", "dl1s", "dl1b", "dw1", "db1",
             "dw2", "db2", "dl2s", "dl2b"]
    for n, x, y in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-3, err_msg=n)


def test_attn_tail_dropout_masks_consistent():
    """Same seed => grad matches the finite-difference slope (the three
    in-kernel masks must be identical in fwd and bwd)."""
    try:
        h = jax.random.normal(jax.random.PRNGKey(16), (32, D))
        a = jax.random.normal(jax.random.PRNGKey(17), (32, D))
        args = _tail_params(jax.random.PRNGKey(18))
        p, seed = 0.3, jnp.int32(11)

        def f(h):
            return jnp.sum(fb.attn_tail_block(h, a, *args, seed, p, 32,
                                              True))

        v = jax.random.normal(jax.random.PRNGKey(19), h.shape) * 1e-3
        g = jax.grad(f)(h)
        lhs = float(jnp.vdot(g, v))
        rhs = float((f(h + v) - f(h - v)) / 2.0)
        assert abs(lhs - rhs) < 5e-3 * max(1.0, abs(rhs)), (lhs, rhs)
    except NotImplementedError as e:  # pragma: no cover
        import pytest
        pytest.skip(f"pallas PRNG not emulated in interpret mode: {e}")


def test_full_forward_matches_with_pallas_tail(monkeypatch):
    """Integrated path: RLMG_FFN_BACKEND=pallas-tail (interpret) matches
    the XLA composition on the full tiny model."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 6), 0, 8)
    ref = lt.forward_hidden(params, cfg, x, deterministic=True)
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    got = lt.forward_hidden(params, cfg, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_ffn_backend_selection(monkeypatch):
    """Pins the fused-backend default policy: explicit env wins at any
    shape; the implicit default requires single-device TPU AND
    >=RLMG_FFN_MIN_ROWS rows (CPU hosts and small RL shapes stay xla)."""
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    monkeypatch.delenv("RLMG_FFN_BACKEND", raising=False)
    # this suite runs on the CPU backend -> implicit default is always xla
    assert lt._ffn_backend(100) == "xla"
    assert lt._ffn_backend(1 << 20) == "xla"
    # explicit choice wins regardless of shape
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    assert lt._ffn_backend(1) == "pallas-tail"
    monkeypatch.setenv("RLMG_FFN_BACKEND", "xla")
    assert lt._ffn_backend(1 << 20) == "xla"
    # threshold knob parses
    monkeypatch.setenv("RLMG_FFN_MIN_ROWS", "123")
    assert lt._ffn_min_rows() == 123


def test_fused_path_rng_none_means_no_dropout(monkeypatch):
    """deterministic=False with rng=None must equal the deterministic
    output (cm.dropout semantics) — not dropout with a fixed seed."""
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=1,
        n_head=2, d_inner=64, dropout=0.5)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 6), 0, 8)
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    det = lt.forward_hidden(params, cfg, x, deterministic=True)
    no_rng = lt.forward_hidden(params, cfg, x, deterministic=False, rng=None)
    np.testing.assert_allclose(np.asarray(no_rng), np.asarray(det),
                               rtol=1e-6, atol=1e-6)


def test_attn_tail_dp_mesh_matches_single_device(monkeypatch):
    """dp=8 virtual-mesh train step with the fused tail (shard_map per
    batch shard) must match the single-device fused step (VERDICT r3 #5:
    meshes used to silently drop to the all-XLA layer)."""
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh, shard_batch, shard_params)
    from reinforcement_learning_in_music_generation_tpu.train import (
        agent_train_step, optim)

    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    monkeypatch.setenv("RLMG_FFN_INTERPRET", "1")
    monkeypatch.setenv("RLMG_FFN_BLOCK", "32")
    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)  # dropout seeds differ per shard
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


def test_ffn_backend_tp_guard(monkeypatch):
    """tp>1 can never run the fused tail (the fused LN would normalize
    ffn2's partial sums) — even against an explicit env override
    (ADVICE r3 #4)."""
    import warnings
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh)

    mesh = make_mesh(dp=4, tp=2)
    monkeypatch.setenv("RLMG_FFN_BACKEND", "pallas-tail")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert lt._ffn_backend(1 << 20, mesh) == "xla"
    assert any("partial sums" in str(x.message) for x in w)
    monkeypatch.delenv("RLMG_FFN_BACKEND")
    assert lt._ffn_backend(1 << 20, mesh) == "xla"
