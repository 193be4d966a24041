"""Pipeline parallelism (parallel/pipeline.py): parity vs the
single-device layer scan on the virtual 8-device CPU mesh.

The reference is single-GPU (SURVEY §2.5) — this subsystem is
green-field, so the tests pin it against the framework's own
forward/loss/grad instead of reference behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.parallel import (
    pipeline as pl)


def _cfg(n_layer=4):
    return C.LinearTransformerConfig(
        vocab_sizes=(56, 135, 18, 87, 18, 25), emb_sizes=(16,) * 6,
        d_model=64, n_layer=n_layer, n_head=4, d_inner=128)


def _batch(cfg, b=8, s=32, seed=1):
    x = jax.random.randint(jax.random.PRNGKey(seed), (b, s, cfg.n_fields),
                           0, 18)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((b, s), jnp.float32)
    return x, y, mask


@pytest.mark.parametrize("dp,pp,m", [
    (2, 4, 4),
    pytest.param(1, 4, 2, marks=pytest.mark.slow),
    pytest.param(1, 2, 8, marks=pytest.mark.slow),
])
def test_pipeline_forward_matches_layer_scan(dp, pp, m):
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=pp, dp=dp)
    sp = pl.shard_params_pp(mesh, params)
    x, _, _ = _batch(cfg)
    h_ref = lt.forward_hidden(params, cfg, x)
    h_pp = pl.pipeline_forward_hidden(sp, cfg, x, mesh, n_microbatch=m)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_loss_and_grads_match():
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=4, dp=2)
    sp = pl.shard_params_pp(mesh, params)
    x, y, mask = _batch(cfg)

    l_ref = lt.train_losses(params, cfg, x, y, mask, deterministic=True)
    l_pp = pl.pipeline_train_losses(sp, cfg, x, y, mask, mesh,
                                    deterministic=True)
    np.testing.assert_allclose(np.asarray(l_pp), np.asarray(l_ref),
                               atol=1e-6, rtol=1e-6)

    g_ref = jax.grad(lambda p: jnp.mean(
        lt.train_losses(p, cfg, x, y, mask, deterministic=True)))(params)
    g_pp = jax.grad(lambda p: jnp.mean(pl.pipeline_train_losses(
        p, cfg, x, y, mask, mesh, deterministic=True)))(sp)
    for (kp, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                          jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(kp))


@pytest.mark.slow
def test_pipeline_train_step_matches_single_device():
    """Two Adam steps through the reverse pipeline == two single-device
    steps (deterministic loss; same optimizer)."""
    from reinforcement_learning_in_music_generation_tpu.train import optim
    import optax

    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=2, dp=2)
    x, y, mask = _batch(cfg)
    tx = optim.adam(1e-3, grad_clip=3.0)

    def ref_step(p, o):
        def loss_fn(q):
            return jnp.mean(lt.train_losses(q, cfg, x, y, mask,
                                            deterministic=True))
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    p_ref, o_ref = params, tx.init(params)
    p_pp, o_pp = pl.shard_params_pp(mesh, params), tx.init(params)
    losses_ref, losses_pp = [], []
    for _ in range(2):
        p_ref, o_ref, l1 = ref_step(p_ref, o_ref)
        p_pp, o_pp, (l2, _) = pl.pipeline_train_step(
            p_pp, o_pp, cfg, tx, x, y, mask, None, mesh, n_microbatch=4)
        losses_ref.append(float(l1))
        losses_pp.append(float(l2))
    np.testing.assert_allclose(losses_pp, losses_ref, atol=1e-5, rtol=1e-5)
    assert losses_ref[1] < losses_ref[0]


@pytest.mark.slow
def test_pipeline_stochastic_mode_runs():
    """Dropout path: finite loss, grads flow to every layer slab (masks
    are decorrelated per microbatch/dp shard — distribution-equal, not
    bit-equal, to the single-device draw)."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=4, dp=1)
    x, y, mask = _batch(cfg)
    loss, g = jax.value_and_grad(lambda p: jnp.mean(pl.pipeline_train_losses(
        p, cfg, x, y, mask, mesh, n_microbatch=2, deterministic=False,
        rng=jax.random.PRNGKey(7))))(params)
    assert np.isfinite(float(loss))
    gl = np.asarray(jnp.abs(g["layers"]["ffn1"]["w"]).sum(axis=(1, 2)))
    assert (gl > 0).all(), "some pipeline stage received zero gradient"


def test_pipeline_rejects_bad_shapes():
    cfg = _cfg(n_layer=4)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=3, dp=1)
    x, _, _ = _batch(cfg, b=6)
    with pytest.raises(ValueError, match="not divisible by pp"):
        pl.pipeline_forward_hidden(params, cfg, x, mesh)
    mesh2 = pl.make_pp_mesh(pp=2, dp=2)
    x2, _, _ = _batch(cfg, b=6)
    with pytest.raises(ValueError, match="not divisible by dp"):
        pl.pipeline_forward_hidden(params, cfg, x2, mesh2, n_microbatch=4)


@pytest.mark.slow
def test_pretrain_loop_with_pp_mesh(tmp_path):
    """The pretrain LOOP detects a 'pp' mesh and routes through
    agent_pp_train_step; the loss trajectory matches single-device
    (dropout=0 so the microbatch rng decorrelation is inert)."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)
    x, y, mask = dataset.synthetic_cp_dataset(4, 32, n_class=cfg.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    pcfg = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                            ckpt_dir=str(tmp_path / "c1"),
                            exp_dir=str(tmp_path / "e1"))
    _, _, hist_ref = pt.pretrain(params, cfg, x, y, mask, pcfg)

    mesh = pl.make_pp_mesh(pp=2, dp=2)
    pcfg2 = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                             ckpt_dir=str(tmp_path / "c2"),
                             exp_dir=str(tmp_path / "e2"))
    _, _, hist_pp = pt.pretrain(params, cfg, x, y, mask, pcfg2, mesh=mesh)
    np.testing.assert_allclose(hist_pp, hist_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_3d_dp_pp_tp_parity():
    """dp=2 x pp=2 x tp=2 over all 8 virtual devices: the manual-Megatron
    stage layer (_layer_forward_tp, explicit psum('tp') collectives)
    matches the single-device forward/loss/grads."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=2, dp=2, tp=2)
    sp = pl.shard_params_pp(mesh, params)
    x, y, mask = _batch(cfg)

    h_ref = lt.forward_hidden(params, cfg, x)
    h_pp = pl.pipeline_forward_hidden(sp, cfg, x, mesh, n_microbatch=2)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-5)

    g_ref = jax.grad(lambda p: jnp.mean(
        lt.train_losses(p, cfg, x, y, mask, deterministic=True)))(params)
    g_pp = jax.grad(lambda p: jnp.mean(pl.pipeline_train_losses(
        p, cfg, x, y, mask, mesh, n_microbatch=2,
        deterministic=True)))(sp)
    for (kp, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                          jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(kp))


def test_pipeline_tp_rejects_bad_divisibility():
    cfg = _cfg()  # n_head=4, d_inner=128
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=2, dp=1, tp=3)
    x, _, _ = _batch(cfg, b=6)
    with pytest.raises(ValueError, match="must divide n_head"):
        pl.pipeline_forward_hidden(params, cfg, x, mesh, n_microbatch=2)


@pytest.mark.slow
def test_pretrain_pp_grad_accum_matches_big_batch(tmp_path):
    """VERDICT r4 #3: grad-accum composes with pipeline meshes.  K=2
    accumulation of half-batches through the pp grad step must follow the
    unaccumulated big-batch trajectory exactly (dropout=0, 1/K-pre-scaled
    micro-grads sum to the big-batch mean gradient)."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)
    x, y, mask = dataset.synthetic_cp_dataset(8, 32, n_class=cfg.vocab_sizes)
    # full masks: the accumulation contract is exact for equal mask sums
    # (micro-batches normalize CE by their OWN mask sums — agent_grad_step
    # docstring); ragged masks drift ~5e-4 by reweighting, by design
    mask = jnp.ones_like(mask)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)

    mesh = pl.make_pp_mesh(pp=2, dp=1)
    pcfg_ref = C.PretrainConfig(n_epoch=2, batch_size=4, lr=1e-3,
                                ckpt_dir=str(tmp_path / "c1"),
                                exp_dir=str(tmp_path / "e1"))
    _, _, hist_ref = pt.pretrain(params, cfg, x, y, mask, pcfg_ref,
                                 mesh=mesh)

    pcfg_acc = C.PretrainConfig(n_epoch=2, batch_size=2, grad_accum=2,
                                lr=1e-3, ckpt_dir=str(tmp_path / "c2"),
                                exp_dir=str(tmp_path / "e2"))
    _, _, hist_acc = pt.pretrain(params, cfg, x, y, mask, pcfg_acc,
                                 mesh=mesh)
    np.testing.assert_allclose(hist_acc, hist_ref, rtol=1e-4, atol=1e-5)


def test_pp_grad_step_matches_full_batch_grads():
    """pipeline_grad_step micro-grads (1/K-scaled) sum to the big-batch
    pipeline gradient (fast sliver of the slow trajectory test above)."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = pl.make_pp_mesh(pp=2, dp=1)
    sp = pl.shard_params_pp(mesh, params)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 16, 6), 0, 8)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((4, 16), jnp.float32)

    g_full, _ = pt.agent_pp_grad_step(sp, cfg, x, y, mask,
                                      jax.random.PRNGKey(2), mesh=mesh)
    g1, _ = pt.agent_pp_grad_step(sp, cfg, x[:2], y[:2], mask[:2],
                                  jax.random.PRNGKey(3), mesh=mesh,
                                  scale=0.5)
    g2, _ = pt.agent_pp_grad_step(sp, cfg, x[2:], y[2:], mask[2:],
                                  jax.random.PRNGKey(4), mesh=mesh,
                                  scale=0.5)
    gsum = pt._tree_add(g1, g2)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_full, gsum)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6
