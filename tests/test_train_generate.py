"""Pretrain step + generation loop + sharded multi-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.data import dataset
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import linear_transformer as lt
from reinforcement_learning_in_music_generation_tpu.train import optim
import reinforcement_learning_in_music_generation_tpu.train.pretrain as pretrain
from reinforcement_learning_in_music_generation_tpu.parallel import (
    make_mesh, param_specs, shard_params, shard_batch)

TINY = C.LinearTransformerConfig(
    vocab_sizes=(8, 8, 8, 8, 8, 8), emb_sizes=(8,) * 6,
    d_model=16, n_layer=2, n_head=2, d_inner=32)


def test_pretrain_loss_decreases(tmp_path):
    x, y, mask = dataset.synthetic_cp_dataset(8, 48, n_class=TINY.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    pcfg = C.PretrainConfig(n_epoch=6, batch_size=4, lr=3e-3,
                            ckpt_dir=str(tmp_path / "ckpt"),
                            exp_dir=str(tmp_path / "exp"))
    params, opt_state, history = pretrain.pretrain(
        params, TINY, x, y, mask, pcfg)
    assert len(history) >= 2
    assert history[-1] < history[0]
    # Saver logfile exists with the reference's line format
    log = (tmp_path / "exp" / "log.txt").read_text()
    assert "batch loss" in log and " | " in log


def test_generate_tokens_stops_on_bars():
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None], (2, 1, 1))
    res = sampler.generate_tokens(
        params, TINY, jax.random.PRNGKey(1), init,
        max_tokens=64, bar_cond=3, greedy=False)
    assert res.tokens.shape == (2, 65, 6)
    # seed bar counts as 1; generation stops when count reaches 3
    assert (np.asarray(res.n_bars) <= 3).all()
    # valid positions: once invalid, stays invalid
    v = np.asarray(res.valid)
    for b in range(2):
        run = v[b]
        assert not np.any(~run[:-1] & run[1:])


def test_generate_greedy_deterministic():
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None], (1, 1, 1))
    r1 = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(1), init,
                                 max_tokens=16, greedy=True,
                                 settings=tuple(sampler.smp.GREEDY))
    r2 = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(99), init,
                                 max_tokens=16, greedy=True,
                                 settings=tuple(sampler.smp.GREEDY))
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_token_count_mode():
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    init = jnp.zeros((1, 1, 6), jnp.int32)
    res = sampler.generate_tokens(params, TINY, jax.random.PRNGKey(0), init,
                                  max_tokens=32, token_count=10)
    assert int(np.asarray(res.valid).sum()) == 1 + 10


def test_sharded_train_step_8dev():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2, tp=4)
    x, y, mask = dataset.synthetic_cp_dataset(4, 32, n_class=TINY.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    specs = param_specs(params)
    # heads sharded over tp, norms replicated
    assert specs["heads"]["tempo"]["w"] == jax.sharding.PartitionSpec("tp", None)
    assert specs["final_ln"]["scale"] == jax.sharding.PartitionSpec()
    sharded = shard_params(mesh, params)

    tx = optim.adam(1e-3, grad_clip=3.0)
    opt_state = tx.init(sharded)
    bx, by, bm = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(mask, jnp.float32)))
    p2, o2, (loss, losses) = pretrain.agent_train_step(
        sharded, opt_state, TINY, tx, bx, by, bm, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # step result matches unsharded execution
    params2 = lt.init_params(jax.random.PRNGKey(0), TINY)
    tx2 = optim.adam(1e-3, grad_clip=3.0)
    o0 = tx2.init(params2)
    p_ref, _, (loss_ref, _) = pretrain.agent_train_step(
        params2, o0, TINY, tx2, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(mask, jnp.float32), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_multistep_lr_schedule():
    sched = optim.multistep_lr(0.01, (20, 40), 0.1)
    assert np.isclose(float(sched(0)), 0.01)
    assert np.isclose(float(sched(25)), 0.001)
    assert np.isclose(float(sched(45)), 0.0001)


@pytest.mark.slow  # compiles the unrolled layer scan twice (~14s warm)
def test_scan_unroll_numerics_identical():
    """cfg.scan_unroll is pure scheduling: losses and grads match the
    rolled scan bit-for-bit-ish (same op order within a layer)."""
    x, y, mask = dataset.synthetic_cp_dataset(4, 32, n_class=TINY.vocab_sizes)
    import dataclasses
    cfg_u = dataclasses.replace(TINY, scan_unroll=2)
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    bx, by = jnp.asarray(x), jnp.asarray(y)
    bm = jnp.asarray(mask, jnp.float32)
    l1 = lt.train_losses(params, TINY, bx, by, bm, deterministic=True)
    l2 = lt.train_losses(params, cfg_u, bx, by, bm, deterministic=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)

    g1 = jax.grad(lambda p: jnp.mean(lt.train_losses(
        p, TINY, bx, by, bm, deterministic=True)))(params)
    g2 = jax.grad(lambda p: jnp.mean(lt.train_losses(
        p, cfg_u, bx, by, bm, deterministic=True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pretrain_multistep_lr_wired(tmp_path):
    """PretrainConfig.lr_milestones (epochs) drives the optimizer lr —
    the my_pretrain MultiStepLR[500] path (my_pretrain.py:63-66), scaled
    here to milestone epoch 1 so two epochs cross it."""
    x, y, mask = dataset.synthetic_cp_dataset(8, 32, n_class=TINY.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), TINY)
    pcfg = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                            lr_milestones=(1,), lr_gamma=0.1,
                            ckpt_dir=str(tmp_path / "ckpt"),
                            exp_dir=str(tmp_path / "exp"))
    _, opt_state, _ = pretrain.pretrain(params, TINY, x, y, mask, pcfg)
    # chain = (clip, inject_hyperparams(adam)); after epoch 2 the lr
    # hyperparam must have decayed by gamma
    lr_now = float(opt_state[1].hyperparams["learning_rate"])
    assert np.isclose(lr_now, 1e-4, rtol=1e-3), lr_now


def test_cli_flags_parse():
    """ppo-train --compat-forward-returns and my-pretrain --lr-milestones
    reach their configs (VERDICT r1, Next #10)."""
    from reinforcement_learning_in_music_generation_tpu.apps import cli
    p = cli.build_parser()
    a = p.parse_args(["ppo-train", "--compat-forward-returns"])
    assert a.compat_forward_returns is True
    a = p.parse_args(["ppo-train"])
    assert a.compat_forward_returns is False
    a = p.parse_args(["my-pretrain", "--lr-milestones", "500,700"])
    assert a.lr_milestones == "500,700"
    # round-4 surfaces
    a = p.parse_args(["pretrain", "--pp", "2", "--tp", "2", "--dp", "2",
                      "--zero1", "--grad-accum", "4",
                      "--ckpt-backend", "orbax", "--save-on-interrupt"])
    assert (a.pp, a.tp, a.dp) == (2, 2, 2)
    assert a.zero1 and a.grad_accum == 4
    assert a.ckpt_backend == "orbax" and a.save_on_interrupt
    a = p.parse_args(["generate", "--continuous", "--continuous-batch", "16"])
    assert a.continuous and a.continuous_batch == 16
    a = p.parse_args(["serve", "--requests", "r.jsonl", "--batch", "4",
                      "--max-requests", "2", "--idle-timeout", "3.5"])
    assert a.requests == "r.jsonl" and a.batch == 4
    assert a.max_requests == 2 and a.idle_timeout == 3.5


def test_generate_fused_sampling_greedy_matches():
    """fused_sampling=True must produce the identical greedy token stream
    (argmax over the concatenated-head logits == per-field argmax)."""
    import jax
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    import jax.numpy as jnp
    import numpy as np
    cfg = C.agent_config(n_layer=2, d_model=64, n_head=2, d_inner=128,
                         max_len=64)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None, :],
                    (2, 1, 1))
    a = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(1), init,
                                max_tokens=16, greedy=True,
                                settings=tuple(sampler.smp.GREEDY),
                                fused_sampling=False)
    b = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(1), init,
                                max_tokens=16, greedy=True,
                                settings=tuple(sampler.smp.GREEDY),
                                fused_sampling=True)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_generate_fused_sampling_stochastic_valid():
    """Stochastic fused-sampling decode emits in-vocab tokens for every
    field (the RNG stream differs from the per-field path by design)."""
    import jax
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    import jax.numpy as jnp
    import numpy as np
    cfg = C.agent_config(n_layer=2, d_model=64, n_head=2, d_inner=128,
                         max_len=64)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None, :],
                    (3, 1, 1))
    r = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(2), init,
                                max_tokens=24, fused_sampling=True)
    toks = np.asarray(r.tokens)
    for f, v in enumerate(cfg.vocab_sizes):
        assert toks[..., f].min() >= 0 and toks[..., f].max() < v


@pytest.mark.slow  # two full train-step compiles (~28s warm)
def test_remat_train_step_matches_nonremat():
    """cfg.remat=True only changes what is SAVED for backward: the loss is
    bit-identical; gradients match to f32 rounding (XLA fuses the
    recomputed forward differently than the saved one)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.ops import losses

    cfg = C.agent_config(n_layer=2, d_model=64, n_head=2, d_inner=128,
                         max_len=64)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x, y, mask = dataset.synthetic_cp_dataset(2, 32, n_class=cfg.vocab_sizes)
    x, y = jnp.asarray(x), jnp.asarray(y)
    mask = jnp.asarray(mask, jnp.float32)

    def loss_fn(p, c):
        return jnp.mean(lt.train_losses(p, c, x, y, mask,
                                        deterministic=True))

    l0, g0 = jax.value_and_grad(loss_fn)(params, cfg)
    l1, g1 = jax.value_and_grad(loss_fn)(
        params, dataclasses.replace(cfg, remat=True))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_decode_path_auto_dispatch(monkeypatch):
    """Small batches must NOT take the v6 persistent path (it pads to 128
    lanes; measured crossover B~64-96, BENCH.md r3) unless the env forces
    it; the env kill-switch must always win."""
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    monkeypatch.delenv("RLMG_PERSISTENT_DECODE", raising=False)
    monkeypatch.delenv("RLMG_PERSISTENT_MIN_BATCH", raising=False)
    assert sampler.persistent_min_batch() == 65
    # below the crossover: never persistent, whatever the backend
    assert sampler.use_persistent_decode(batch=5) is False
    assert sampler.use_persistent_decode(batch=64) is False
    monkeypatch.setenv("RLMG_PERSISTENT_MIN_BATCH", "32")
    assert sampler.use_persistent_decode(batch=5) is False
    # at/above the crossover the platform check decides (False on CPU)
    ge = sampler.use_persistent_decode(batch=128)
    assert ge == sampler.use_persistent_decode(batch=None)
    # env override beats both directions
    monkeypatch.setenv("RLMG_PERSISTENT_DECODE", "1")
    assert sampler.use_persistent_decode(batch=1) is True
    monkeypatch.setenv("RLMG_PERSISTENT_DECODE", "0")
    assert sampler.use_persistent_decode(batch=1024) is False


@pytest.mark.slow
def test_pretrain_loop_with_tp_mesh(tmp_path):
    """The pretrain LOOP threads the mesh into the step at any tp (the
    fused-backend guards need the true tp); a dp=2 x tp=2 mesh run must
    match the single-device loss trajectory."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)
    x, y, mask = dataset.synthetic_cp_dataset(4, 32, n_class=cfg.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    pcfg = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                            ckpt_dir=str(tmp_path / "c1"),
                            exp_dir=str(tmp_path / "e1"))
    _, _, hist_ref = pt.pretrain(params, cfg, x, y, mask, pcfg)

    mesh = make_mesh(dp=2, tp=2)
    pcfg2 = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                             ckpt_dir=str(tmp_path / "c2"),
                             exp_dir=str(tmp_path / "e2"))
    _, _, hist_mesh = pt.pretrain(params, cfg, x, y, mask, pcfg2, mesh=mesh)
    np.testing.assert_allclose(
        [h["loss"] if isinstance(h, dict) else h for h in hist_mesh],
        [h["loss"] if isinstance(h, dict) else h for h in hist_ref],
        rtol=1e-4, atol=1e-5)
