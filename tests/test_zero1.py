"""ZeRO-1 optimizer-state sharding (train/optim.py:zero1 +
parallel/sharding.py:zero1_specs): numerics identical to plain Adam,
Adam moments actually sharded over 'dp'.

Green-field (the reference is single-GPU torch.optim.Adam,
dqn_policy/agent_pretrain.py:516); pinned against the framework's own
unwrapped optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.parallel import (
    make_mesh, shard_batch, shard_params)
from reinforcement_learning_in_music_generation_tpu.parallel.sharding import (
    zero1_specs)
from reinforcement_learning_in_music_generation_tpu.train import (
    agent_train_step, optim)


def _cfg():
    return C.LinearTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=32, n_layer=2,
        n_head=2, d_inner=64, dropout=0.0)


def test_zero1_specs_add_dp_on_free_axis():
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=4, tp=2)
    specs = zero1_specs(mesh, params)
    # ffn1 w (L, D, F): Megatron tp on F, zero1 adds dp on D
    assert specs["layers"]["ffn1"]["w"] == P(None, "dp", "tp")
    # layer norms (L, D): no tp rule, dp goes on the largest free axis (D)
    assert "dp" in tuple(specs["layers"]["ln1"]["scale"])
    # every leaf must resolve to a PartitionSpec
    assert all(isinstance(s, P) for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))


@pytest.mark.slow
def test_zero1_matches_plain_adam_and_shards_moments():
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (8, 32, 6), 0, 8)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((8, 32), jnp.float32)

    tx0 = optim.adam(1e-3, grad_clip=3.0)
    p0, o0 = params, tx0.init(params)
    for _ in range(3):
        p0, o0, (l0, _) = agent_train_step(p0, o0, cfg, tx0, x, y, mask,
                                           jax.random.PRNGKey(9))

    mesh = make_mesh(dp=4, tp=2)
    sp = shard_params(mesh, params)
    tx1 = optim.zero1(optim.adam(1e-3, grad_clip=3.0), mesh, params)
    p1, o1 = sp, tx1.init(sp)
    bx, by, bm = shard_batch(mesh, (x, y, mask))
    for _ in range(3):
        p1, o1, (l1, _) = agent_train_step(p1, o1, cfg, tx1, bx, by, bm,
                                           jax.random.PRNGKey(9))

    assert float(l0) == pytest.approx(float(l1), abs=1e-6)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, p1)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5

    # the moments are REALLY sharded: local shard is 1/(dp*tp) of global
    mu = o1[1].inner_state[0].mu
    leaf = mu["layers"]["ffn1"]["w"]
    assert leaf.sharding.spec == P(None, "dp", "tp")
    local = leaf.sharding.shard_shape(leaf.shape)
    assert np.prod(local) * 8 == np.prod(leaf.shape)


def test_zero1_rejects_meshless_config(tmp_path):
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    cfg = _cfg()
    x, y, mask = dataset.synthetic_cp_dataset(4, 16, n_class=cfg.vocab_sizes)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    pcfg = C.PretrainConfig(n_epoch=1, batch_size=4, lr=1e-3, zero1=True,
                            ckpt_dir=str(tmp_path), exp_dir=str(tmp_path))
    with pytest.raises(ValueError, match="needs a mesh with dp>1"):
        pt.pretrain(params, cfg, x, y, mask, pcfg)


@pytest.mark.slow
def test_grad_accum_matches_large_batch():
    """K=2 accumulation over two half-batches == one step on the full
    batch (deterministic loss, full masks, same Adam)."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    import optax

    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (8, 32, 6), 0, 8)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((8, 32), jnp.float32)
    tx = optim.adam(1e-3, grad_clip=None)

    # reference: one step on the full batch (grads = mean over 8 rows)
    def loss_fn(p):
        return jnp.mean(lt.train_losses(p, cfg, x, y, mask,
                                        deterministic=True))
    g_full = jax.grad(loss_fn)(params)
    o0 = tx.init(params)
    u, _ = tx.update(g_full, o0, params)
    p_ref = optax.apply_updates(params, u)

    # accumulate two half-batches via the pretrain helpers; rng=None path
    # is unavailable (agent_grad_step trains with dropout), so use a
    # dropout-free cfg: _cfg() has dropout=0.0 -> any rng gives the same
    g1, _ = pt.agent_grad_step(params, cfg, x[:4], y[:4], mask[:4],
                               jax.random.PRNGKey(5), scale=0.5)
    g2, _ = pt.agent_grad_step(params, cfg, x[4:], y[4:], mask[4:],
                               jax.random.PRNGKey(6), scale=0.5)
    gsum = pt._tree_add(g1, g2)
    p_acc, _ = pt.apply_grads(params, tx.init(params), tx, gsum)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_acc)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6


def test_longformer_grad_accum_matches_big_batch():
    """VERDICT r4 #3: the accumulation path covers the discriminator LM —
    longformer_grad_step micro-grads (1/K-scaled) sum to the big-batch
    gradient of longformer_lm_step's loss."""
    import reinforcement_learning_in_music_generation_tpu.train.pretrain as pt
    from reinforcement_learning_in_music_generation_tpu.models import (
        longformer as lf)
    from reinforcement_learning_in_music_generation_tpu.ops.losses import (
        fields_cross_entropy)

    wcfg = C.WindowTransformerConfig(
        vocab_sizes=(8,) * 6, emb_sizes=(8,) * 6, d_model=16, n_layer=1,
        n_head=2, d_inner=32, max_pos=64, attention_window=8, dropout=0.0)
    params = lf.init_params(jax.random.PRNGKey(0), wcfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 16, 6), 0, 8)
    y = jnp.roll(x, -1, axis=1)
    mask = jnp.ones((4, 16), jnp.float32)

    def loss_fn(p):
        logits = lf.token_logits(p, wcfg, x, mask, deterministic=True)
        return jnp.mean(fields_cross_entropy(logits, y, mask))
    g_full = jax.grad(loss_fn)(params)

    g1, _ = pt.longformer_grad_step(params, wcfg, x[:2], y[:2], mask[:2],
                                    jax.random.PRNGKey(2), scale=0.5)
    g2, _ = pt.longformer_grad_step(params, wcfg, x[2:], y[2:], mask[2:],
                                    jax.random.PRNGKey(3), scale=0.5)
    gsum = pt._tree_add(g1, g2)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_full, gsum)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6
