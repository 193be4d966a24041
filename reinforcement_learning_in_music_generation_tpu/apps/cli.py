"""Unified CLI for the framework — one subcommand per reference entry point.

Reference entry points (README.md:30-50): agent_pretrain/cp-pretrain,
discrim-pretrain, my_pretrain, IRL_dqn_train, ppo_train,
testing-no-type-cp, inference, prepare_data, preprocess — all module-level
-constant scripts there; real flags here.

    python apps/cli.py pretrain --synthetic --epochs 2
    python apps/cli.py generate --songs 5 --bars 50
    python apps/cli.py dqn-train --synthetic --songs 2
    python apps/cli.py ppo-train --synthetic --songs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python reinforcement_learning_in_music_generation_tpu/apps/cli.py`
# from a source checkout (installed entry point `rlmg` doesn't need this)
_repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

import numpy as np


def _jax():
    import jax
    plat = os.environ.get("RLMG_PLATFORM")
    if plat:
        # The env var JAX_PLATFORMS is unreliable with the experimental
        # axon plugin; the config update is authoritative.
        jax.config.update("jax_platforms", plat)
    return jax


# ---------------------------------------------------------------------------
# data commands
# ---------------------------------------------------------------------------

def cmd_prepare_data(args):
    """MIDI folder -> worded_data.pickle + dictionary.pickle
    (ppo_policy/prepare_data.py:360-380, __main__:467-477)."""
    import pickle
    from reinforcement_learning_in_music_generation_tpu.data import tokenizer

    os.makedirs(args.save_folder, exist_ok=True)
    midis = []
    for root, _, files in os.walk(args.midi_folder):
        for f in files:
            if f.endswith((".mid", ".midi")):
                midis.append(os.path.join(root, f))
    print(f"number of midis: {len(midis)}")

    if getattr(args, "scheme", "tuple") == "cp":
        # Compound-word scheme: emits the exact files the DQN pipeline
        # consumes (train_data_linear.npz + dictionary.pkl,
        # dqn_policy/agent_pretrain.py:39-41) — the reference has no encoder
        # for these; this closes that gap.
        from reinforcement_learning_in_music_generation_tpu.data import cp_tokenizer
        x, y, mask, dicts = cp_tokenizer.build_cp_training_data(
            midis, seq_len=args.cp_seq_len, with_type=True,
            workers=args.workers)
        np.savez(os.path.join(args.save_folder, "train_data_linear.npz"),
                 x=x, y=y, mask=mask)
        with open(os.path.join(args.save_folder, "dictionary.pkl"), "wb") as f:
            pickle.dump([dicts[0], dicts[1]], f)
        print(f"CP dataset: x {x.shape} -> {args.save_folder}")
        return

    from reinforcement_learning_in_music_generation_tpu.data import (
        parallel_encode)
    songs = parallel_encode.tuple_extract_corpus(midis, workers=args.workers)
    dicts = tokenizer.construct_tuple_dict()
    dict_path = os.path.join(args.save_folder, "dictionary.pickle")
    tokenizer.save_dict(dicts, dict_path)
    worded = tokenizer.tuple_events_to_words(songs, dicts[0])
    with open(os.path.join(args.save_folder, "worded_data.pickle"), "wb") as f:
        pickle.dump(worded, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"saved dictionary + worded_data to {args.save_folder}")


def cmd_preprocess(args):
    """worded_data.pickle -> our_dataset.pickle (ppo_policy/preprocess.py)."""
    import pickle
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    with open(args.worded_data, "rb") as f:
        worded = pickle.load(f)
    flat = dataset.flatten_worded_songs(worded)
    packed = dataset.process_data(flat, max_seq_len=args.max_seq_len)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(packed, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"train_x {packed['train_x'].shape} -> {args.out}")


def cmd_split_data(args):
    """90/10 split -> worded_data_{train,test}.pickle
    (ppo_policy/prepare_data.py:443-464)."""
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    n_train, n_test = dataset.split_data(args.worded_data, seed=args.seed)
    print(f"n_train: {n_train}, n_test: {n_test}")


# ---------------------------------------------------------------------------
# training commands
# ---------------------------------------------------------------------------

def _load_pretrain_data(args, vocab):
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    if args.synthetic or not args.train_data:
        return dataset.synthetic_cp_dataset(
            args.synthetic_songs, args.seq_len, n_class=vocab)
    x, y, mask, _, _ = dataset.load_cp_npz(args.train_data, args.dictionary)
    return x[:, :args.seq_len], y[:, :args.seq_len], mask[:, :args.seq_len]


def cmd_pretrain(args):
    """Agent CE pretrain (dqn_policy/agent_pretrain.py:485-632)."""
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import linear_transformer as lt
    from reinforcement_learning_in_music_generation_tpu.train import pretrain_lib

    vocab = tuple(int(v) for v in args.vocab.split(",")) if args.vocab else (56, 135, 18, 87, 18, 25)
    mcfg = C.agent_config(vocab, n_layer=args.layers, dtype=args.dtype,
                          scan_unroll=args.scan_unroll)
    x, y, mask = _load_pretrain_data(args, vocab)
    params = lt.init_params(jax.random.PRNGKey(args.seed), mcfg)
    print(f"n_parameters: {lt.n_params(params):,}")
    mesh = None
    if getattr(args, "pp", 1) > 1:
        # 3D parallelism: dp x pp x tp — pipeline stages hold whole-layer
        # slabs, Megatron tp shards within each stage with manual
        # psum('tp') collectives (parallel/pipeline.py:_layer_forward_tp)
        from reinforcement_learning_in_music_generation_tpu.parallel import (
            make_pp_mesh)
        mesh = make_pp_mesh(pp=args.pp, dp=args.dp, tp=args.tp)
    elif args.dp > 1 or args.tp > 1:
        from reinforcement_learning_in_music_generation_tpu.parallel import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    pcfg = C.PretrainConfig(n_epoch=args.epochs, batch_size=args.batch_size,
                            lr=args.lr, ckpt_dir=args.ckpt_dir,
                            exp_dir=args.exp_dir, seed=args.seed,
                            zero1=getattr(args, "zero1", False),
                            grad_accum=getattr(args, "grad_accum", 1),
                            ckpt_backend=getattr(args, "ckpt_backend",
                                                 "pickle"),
                            save_on_interrupt=getattr(
                                args, "save_on_interrupt", False))
    t0 = time.time()
    params, _, history = pretrain_lib.pretrain(
        params, mcfg, x, y, mask, pcfg, mesh=mesh, max_steps=args.max_steps,
        resume_from=args.resume)
    print(f"done in {time.time()-t0:.1f}s; last epoch loss: "
          f"{history[-1] if history else float('nan')}")


def cmd_my_pretrain(args):
    """Shared pretrain for actor or reward model (ppo_policy/my_pretrain.py:
    34-201): --reward-pretrain switches to the window-transformer reward
    model trained as a token-CE LM (the reference's broken train_step call
    on the LongFormer, done working here); timestamped exp dirs."""
    import datetime
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.train import (
        pretrain_lib, longformer_lm_step)
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    exp_root = os.path.join("./Exp-Pretrain", ts)
    ckpt_dir = os.path.join(exp_root, "model")
    log_dir = os.path.join(exp_root, "log")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    vocab = (49, 19, 19, 89, 67, 25)
    if args.train_data and os.path.exists(args.train_data):
        import pickle
        with open(args.train_data, "rb") as f:
            packed = pickle.load(f)
        x, y, mask = packed["train_x"], packed["train_y"], packed["mask"]
    else:
        x, y, mask = dataset.synthetic_cp_dataset(
            args.synthetic_songs, args.seq_len, n_class=vocab)
    milestones = tuple(int(m) for m in args.lr_milestones.split(",")
                       if m.strip()) if args.lr_milestones else ()
    pcfg = C.PretrainConfig(n_epoch=args.epochs, batch_size=args.batch_size,
                            lr=args.lr, ckpt_dir=ckpt_dir, exp_dir=log_dir,
                            seed=args.seed, lr_milestones=milestones,
                            lr_gamma=args.lr_gamma)
    if args.reward_pretrain:
        from reinforcement_learning_in_music_generation_tpu.models import longformer as lf
        mcfg = C.ppo_reward_config(vocab, n_layer=args.reward_layers)
        params = lf.init_params(jax.random.PRNGKey(args.seed), mcfg)
        pretrain_lib.pretrain(params, mcfg, x, y, mask, pcfg,
                              step_fn=longformer_lm_step,
                              max_steps=args.max_steps)
    else:
        from reinforcement_learning_in_music_generation_tpu.models import (
            linear_transformer as lt)
        mcfg = C.actor_config(vocab, n_layer=args.layers,
                              scan_unroll=args.scan_unroll)
        params = lt.init_params(jax.random.PRNGKey(args.seed), mcfg)
        pretrain_lib.pretrain(params, mcfg, x, y, mask, pcfg,
                              max_steps=args.max_steps)
    print(f"experiment dir: {exp_root}")


def cmd_data_midi(args):
    """Decode one packed-dataset row back to MIDI — the reference's eyeball
    sanity check (ppo_policy/data_midi.py:39-56)."""
    import pickle
    from reinforcement_learning_in_music_generation_tpu.data import tokenizer

    with open(args.dictionary, "rb") as f:
        e2w, w2e = pickle.load(f)
    with open(args.dataset, "rb") as f:
        packed = pickle.load(f)
    row = packed["train_x"][args.row]
    mask = packed.get("mask")
    if mask is not None:
        row = row[mask[args.row] > 0]
    events = tokenizer.words_to_tuple_events(row, w2e)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    tokenizer.tuple_events_to_midi(events, args.out)
    print(f"row {args.row} ({len(events)} events) -> {args.out}")


def cmd_discrim_pretrain(args):
    """Longformer LM pretrain (dqn_policy/discrim-pretrain.py:342-490)."""
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.models import longformer as lf
    from reinforcement_learning_in_music_generation_tpu.train import pretrain_lib, longformer_lm_step
    from reinforcement_learning_in_music_generation_tpu.data import dataset

    vocab = (56, 135, 18, 3, 87, 18, 25) if args.with_type else (56, 135, 18, 87, 18, 25)
    mcfg = (C.discrim_lm_config(vocab, scan_unroll=args.scan_unroll)
            if args.with_type else
            C.discrim_lm_config(vocab, emb_sizes=(128, 256, 64, 512, 256, 128),
                                scan_unroll=args.scan_unroll))
    x, y, mask = dataset.synthetic_cp_dataset(
        args.synthetic_songs, args.seq_len, n_class=vocab)
    params = lf.init_params(jax.random.PRNGKey(args.seed), mcfg)
    pcfg = C.PretrainConfig(n_epoch=args.epochs, batch_size=args.batch_size,
                            lr=args.lr, ckpt_dir=args.ckpt_dir,
                            exp_dir=args.exp_dir, seed=args.seed,
                            grad_accum=getattr(args, "grad_accum", 1))
    pretrain_lib.pretrain(params, mcfg, x, y, mask, pcfg,
                          step_fn=longformer_lm_step, max_steps=args.max_steps)


def cmd_dqn_train(args):
    """DQN + AIRL fine-tune (dqn_policy/IRL_dqn_train.py:386-498)."""
    jax = _jax()
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.rl import airl, buffers, dqn, env
    from reinforcement_learning_in_music_generation_tpu.utils import (
        MetricsBus, Saver, save_checkpoint, bi_loss_plot, score_plotting)

    import dataclasses
    vocab = (56, 135, 18, 87, 18, 25)
    mcfg = C.agent_config(vocab, n_layer=args.layers)
    # unrolled layer loop for the fwd+bwd update; rollout stays rolled
    ucfg = dataclasses.replace(mcfg, scan_unroll=args.layers)
    wcfg = C.airl_discriminator_config(vocab, n_layer=max(1, args.layers - 2))
    cfg = C.DQNConfig(num_songs=args.songs, episodes=args.episodes,
                      buffer_size=args.buffer_size, batch_size=args.batch_size,
                      n_states=args.n_states, n_actions=args.n_actions,
                      ckpt_epoch_gate=args.ckpt_epoch_gate)
    acfg = C.AIRLConfig(batch_size=min(100, args.buffer_size),
                        epochs=args.disc_epochs, lr_step=args.disc_lr_step,
                        lr=args.disc_lr,
                        score_batch_size=min(args.score_batch_size,
                                             args.buffer_size))
    x, y, mask = _load_pretrain_data(args, vocab)
    x, y, mask = jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)

    pretrain_params = None
    if args.pretrain_ckpt:
        from reinforcement_learning_in_music_generation_tpu.utils import load_checkpoint
        pretrain_params = load_checkpoint(args.pretrain_ckpt)["params"]
    rng = jax.random.PRNGKey(cfg.seed)
    state = dqn.init_state(rng, mcfg, cfg, pretrain_params)
    tx = dqn.make_optimizer(cfg)
    rstate = airl.init_state(jax.random.PRNGKey(cfg.seed + 1), wcfg, acfg)
    rtx = airl.make_optimizer(acfg)

    mesh = None
    if args.dp > 1 or args.tp > 1:
        # RL on the ('dp','tp') mesh: Megatron weight shardings, transition
        # batches over dp; GSPMD inserts the collectives (sharded parity:
        # tests/test_rl.py::test_*_sharded_matches_single_device)
        from reinforcement_learning_in_music_generation_tpu.parallel import (
            make_mesh, shard_params)
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        sh_eval = shard_params(mesh, state.eval_params)
        state = dqn.DQNState(sh_eval, shard_params(mesh, state.target_params),
                             tx.init(sh_eval), state.target_count)
        sh_disc = shard_params(mesh, rstate.params)
        rstate = airl.AIRLState(sh_disc, jax.device_put(rstate.bn_state),
                                rtx.init(sh_disc))

    agent_buf = buffers.buffer_init(cfg.buffer_size, buffers.agent_field_specs(
        cfg.n_states, cfg.n_actions, cfg.n_features))
    expert_buf = buffers.buffer_init(cfg.buffer_size, buffers.expert_field_specs(
        cfg.n_states, cfg.n_actions, cfg.n_features))

    saver = Saver(args.exp_dir)
    bus = MetricsBus(saver, use_wandb=args.wandb)
    mse_hist, ce_hist, total_hist = [], [], []
    agent_score_hist, expert_score_hist = [], []
    updates = 0
    for epoch in range(cfg.num_songs):
        song = epoch % x.shape[0]
        agent_ts, expert_ts = env.dqn_rollout_song(
            state.eval_params, mcfg, x[song], y[song], mask[song],
            episodes=cfg.episodes, n_states=cfg.n_states,
            n_actions=cfg.n_actions)
        agent_buf = buffers.buffer_store_batch(agent_buf, agent_ts)
        expert_buf = buffers.buffer_store_batch(expert_buf, expert_ts)

        if int(agent_buf.counter) > cfg.buffer_size:
            rng, r1, r2, r2b, r3 = jax.random.split(rng, 5)
            rstate, agent_r, expert_r, _ = airl.update_disc(
                rstate, wcfg, acfg, rtx, buffers.buffer_get(agent_buf),
                buffers.buffer_get(expert_buf), r1,
                train=(updates == 0 or args.retrain_disc))
            # learning-effect evidence (AIRL.py:194-226 wandb curves): the
            # discriminator's mean expert vs agent buffer scores
            agent_score_hist.append(float(agent_r.mean()))
            expert_score_hist.append(float(expert_r.mean()))
            agent_buf = agent_buf._replace(
                data={**agent_buf.data, "reward": agent_r})
            batch = buffers.buffer_sample(agent_buf, r2, cfg.batch_size)
            ebatch = buffers.buffer_sample(expert_buf, r2b, cfg.batch_size)
            if mesh is not None:
                from reinforcement_learning_in_music_generation_tpu.parallel import (
                    shard_batch)
                batch = shard_batch(mesh, batch)
                ebatch = shard_batch(mesh, ebatch)
            state, metrics = dqn.update(
                state, ucfg, cfg, tx, batch,
                {"state": ebatch["state"], "next_state": ebatch["next_state"],
                 "mask_next_state": ebatch["mask_next_state"]}, r3)
            updates += 1
            bus.log({**{k: float(v) for k, v in metrics.items()},
                     "agent_score": agent_score_hist[-1],
                     "expert_score": expert_score_hist[-1]})
            mse_hist.append(float(metrics["mse"]))
            ce_hist.append(float(metrics["ce"]))
            total_hist.append(float(metrics["total"]))
            print(f"Epoch {epoch}/{cfg.num_songs} | MSE {metrics['mse']:.4f} "
                  f"| CE {metrics['ce']:.4f} | total {metrics['total']:.4f} "
                  f"| D(agent) {agent_score_hist[-1]:.3f} "
                  f"| D(expert) {expert_score_hist[-1]:.3f}")
            if epoch >= cfg.ckpt_epoch_gate:
                ckpt_path = os.path.join(args.ckpt_dir, "dqn_best.ckpt")
                save_checkpoint(ckpt_path,
                                state.eval_params, state.opt_state, epoch)
                bus.save_file(ckpt_path)  # IRL_dqn_train.py:370 wandb.save
                # pickled training record (IRL_dqn_train.py:380-383):
                # 'Agent' = the last update batch's rewards, and the three
                # loss histories under the reference's exact keys
                # (including its literal ' global_loss' leading space)
                import pickle as _pickle
                record = {"Agent": np.asarray(batch["reward"]),
                          "first_loss": mse_hist, "sec_loss": ce_hist,
                          " global_loss": total_hist}
                with open(os.path.join(args.ckpt_dir, "agent_info.pickle"),
                          "wb") as f:
                    _pickle.dump(record, f)
                bi_loss_plot(mse_hist, ce_hist, total_hist,
                             ["MSE", "CE", "Global"],
                             os.path.join(args.exp_dir, "agent_loss.png"))
                score_plotting(agent_score_hist, expert_score_hist,
                               os.path.join(args.exp_dir, "disc_scores.png"))
                from reinforcement_learning_in_music_generation_tpu.utils import (
                    curve_plot)
                curve_plot({"D(agent)": agent_score_hist,
                            "D(expert)": expert_score_hist},
                           os.path.join(args.exp_dir, "disc_separation.png"),
                           xlabel="Update", ylabel="Mean discriminator score")
        else:
            print(f"Epoch {epoch}/{cfg.num_songs} | buffer "
                  f"{int(agent_buf.counter)}/{cfg.buffer_size}")
        if args.max_updates and updates >= args.max_updates:
            break
    save_checkpoint(os.path.join(args.ckpt_dir, "dqn_last.ckpt"),
                    state.eval_params, state.opt_state, cfg.num_songs)
    if updates:
        from reinforcement_learning_in_music_generation_tpu.utils import (
            curve_plot)
        bi_loss_plot(mse_hist, ce_hist, total_hist, ["MSE", "CE", "Global"],
                     os.path.join(args.exp_dir, "agent_loss.png"))
        score_plotting(agent_score_hist, expert_score_hist,
                       os.path.join(args.exp_dir, "disc_scores.png"))
        curve_plot({"D(agent)": agent_score_hist,
                    "D(expert)": expert_score_hist},
                   os.path.join(args.exp_dir, "disc_separation.png"),
                   xlabel="Update", ylabel="Mean discriminator score")


def cmd_ppo_train(args):
    """PPO fine-tune (ppo_policy/ppo_train.py:419-528)."""
    jax = _jax()
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.rl import ppo
    from reinforcement_learning_in_music_generation_tpu.utils import (
        MetricsBus, Saver, save_checkpoint)

    vocab = (49, 19, 19, 89, 67, 25)
    acfg = C.actor_config(vocab, n_layer=args.layers)
    ccfg = C.critic_config(vocab, n_layer=args.layers)
    rcfg = C.ppo_reward_config(vocab, n_layer=max(1, args.layers - 2))
    cfg = C.PPOConfig(num_songs=args.songs, episodes=args.episodes,
                      n_states=args.n_states, n_actions=args.n_actions,
                      ppo_steps=args.ppo_steps,
                      compat_forward_returns=args.compat_forward_returns)
    x, y, mask = _load_pretrain_data(args, vocab)
    x, y, mask = jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)

    actor_params = reward_params = None
    if args.pretrain_actor:
        from reinforcement_learning_in_music_generation_tpu.utils import load_checkpoint
        actor_params = load_checkpoint(args.pretrain_actor)["params"]
    if args.pretrain_reward:
        # reward model from `my-pretrain --reward-pretrain` (the reference
        # loads its trained IRL/reward ckpt, ppo_train.py:430-447; with a
        # random-init reward model eval_score is a flat ~0.5 and the PPO
        # reward curve has nothing to climb)
        from reinforcement_learning_in_music_generation_tpu.utils import load_checkpoint
        reward_params = load_checkpoint(args.pretrain_reward)["params"]
    rng = jax.random.PRNGKey(cfg.seed)
    state = ppo.init_state(rng, acfg, ccfg, rcfg, cfg,
                           actor_params=actor_params,
                           reward_params=reward_params)
    txs = ppo.make_optimizers(cfg)
    cfgs = (acfg, ccfg, rcfg)

    mesh = None
    if args.dp > 1 or args.tp > 1:
        from reinforcement_learning_in_music_generation_tpu.parallel import (
            make_mesh, shard_params)
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        atx, ctx = txs
        sh_actor = shard_params(mesh, state.actor_params)
        sh_critic = shard_params(mesh, state.critic_params)
        state = ppo.PPOState(sh_actor, sh_critic,
                             shard_params(mesh, state.reward_params),
                             atx.init(sh_actor), ctx.init(sh_critic))
    saver = Saver(args.exp_dir)
    bus = MetricsBus(saver, use_wandb=args.wandb)
    policy_losses, reward_hist = [], []
    for epoch in range(cfg.num_songs):
        song = epoch % x.shape[0]
        agent_ts, expert_ts = ppo.rollout_song(
            state, cfgs, x[song], y[song], mask[song],
            episodes=cfg.episodes, n_states=cfg.n_states,
            n_actions=cfg.n_actions)
        # learning-effect evidence (ppo_train.py:516-527 wandb curve): the
        # learned-reward model's mean score of this epoch's rollout
        reward_hist.append(float(agent_ts["reward"].mean()))
        returns = ppo.calculate_returns(
            agent_ts["reward"][:, 0], cfg.discount,
            compat_forward=cfg.compat_forward_returns)
        adv = ppo.calculate_advantages(returns, agent_ts["value"])
        if mesh is not None:
            from reinforcement_learning_in_music_generation_tpu.parallel import (
                shard_batch)
            agent_ts = shard_batch(mesh, agent_ts)
            expert_ts = shard_batch(mesh, expert_ts)
            adv, returns = shard_batch(mesh, (adv, returns))
        rng, up_rng = jax.random.split(rng)
        state, metrics = ppo.update_policy(
            state, cfgs, cfg, txs, agent_ts, expert_ts, adv, returns, up_rng)
        policy_losses.append(float(metrics["actor_loss"]))
        bus.log({**{k: float(v) for k, v in metrics.items()},
                 "mean_reward": reward_hist[-1]})
        print(f"Epoch {epoch}/{cfg.num_songs} | actor {metrics['actor_loss']:.4f}"
              f" | critic {metrics['value_loss']:.4f}"
              f" | reward {reward_hist[-1]:.4f}")
        if epoch % 5 == 0:
            save_checkpoint(os.path.join(args.ckpt_dir, "ppo_best.ckpt"),
                            state.actor_params, None, epoch)
            from reinforcement_learning_in_music_generation_tpu.utils import (
                curve_plot)
            curve_plot({"mean reward": reward_hist},
                       os.path.join(args.exp_dir, "ppo_reward.png"),
                       ylabel="Learned reward (rollout mean)")
    if reward_hist:
        from reinforcement_learning_in_music_generation_tpu.utils import (
            curve_plot)
        curve_plot({"mean reward": reward_hist},
                   os.path.join(args.exp_dir, "ppo_reward.png"),
                   ylabel="Learned reward (rollout mean)")


def cmd_generate(args):
    """Generation entry (dqn_policy/testing-no-type-cp.py:182-253):
    batched on-device decode, CP MIDI decode, runtime_stats.json."""
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import tokenizer
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import linear_transformer as lt
    from reinforcement_learning_in_music_generation_tpu.utils import RuntimeStats

    dicts = tokenizer.drop_type(tokenizer.construct_cp_dict())
    e2w, w2e = dicts
    vocab = tuple(tokenizer.n_classes(e2w))
    mcfg = C.agent_config(vocab, n_layer=args.layers)
    if args.ckpt:
        from reinforcement_learning_in_music_generation_tpu.utils import load_checkpoint
        tmpl = lt.init_params(jax.random.PRNGKey(0), mcfg)
        params = load_checkpoint(args.ckpt, params_template=tmpl)["params"]
    else:
        params = lt.init_params(jax.random.PRNGKey(args.seed), mcfg)
    if args.dtype == "bfloat16":
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
    os.makedirs(args.out_dir, exist_ok=True)
    gcfg = C.GenerateConfig(n_songs=args.songs, bar_production=args.bars,
                            max_tokens=args.max_tokens, greedy=args.greedy,
                            batch_size=args.songs, out_dir=args.out_dir,
                            seed=args.seed)
    init = sampler.CP_SEED
    if args.prompt:
        # prompt continuation: encode the prompt MIDI to CP rows and seed the
        # recurrent state with them (the REMI writer's prompt mode,
        # ppo_policy/utils.py:308-332, generalized to the CP pipeline)
        from reinforcement_learning_in_music_generation_tpu.data import cp_tokenizer
        enc = cp_tokenizer.CPEncoder()
        rows = enc.encode(args.prompt)
        rows = np.delete(rows, 3, axis=1)            # drop 'type'
        init = rows[: args.prompt_tokens] if args.prompt_tokens else rows
        print(f"prompt: {args.prompt} -> {len(init)} seed tokens")
    mesh = None
    if args.dp > 1 or args.tp > 1:
        from reinforcement_learning_in_music_generation_tpu.parallel import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    stats = RuntimeStats()
    if getattr(args, "continuous", False):
        # continuous batching (generate/serving.py): slots refill the
        # moment a song completes instead of waiting for the batch's
        # slowest song — right for n_songs >> batch serving runs.
        # v1 scope: stochastic, unconditional, single-device — fail
        # loudly rather than silently ignore incompatible flags
        if args.prompt or args.greedy or args.dp > 1 or args.tp > 1:
            raise SystemExit(
                "--continuous does not combine with --prompt/--greedy/"
                "--dp/--tp yet (the serving loop is stochastic, "
                "unconditional, single-device); drop --continuous or "
                "those flags")
        from reinforcement_learning_in_music_generation_tpu.generate import (
            serving)
        batch = args.continuous_batch or min(args.songs, 8)
        kw = dict(n_songs=args.songs, bar_cond=args.bars, batch=batch,
                  max_tokens_per_song=args.max_tokens)
        if args.warmup:
            serving.generate_songs_continuous(
                params, mcfg, jax.random.PRNGKey(args.seed), **kw)
        t0 = time.time()
        res = serving.generate_songs_continuous(
            params, mcfg, jax.random.PRNGKey(args.seed), **kw)
        elapsed = time.time() - t0
        songs = [np.asarray(s) for s in res.songs]
        print(f"continuous batching: {len(songs)} songs in {res.steps} "
              f"decode steps (batch {batch})")
    else:
        if args.warmup:
            sampler.generate_songs(params, mcfg, gcfg, init=init, mesh=mesh)
        t0 = time.time()
        songs = sampler.generate_songs(params, mcfg, gcfg, init=init,
                                       mesh=mesh)
        elapsed = time.time() - t0
    total_tokens = sum(len(s) for s in songs)
    for i, song in enumerate(songs):
        path = os.path.join(args.out_dir, f"get_{i}.mid")
        tokenizer.write_midi_cp(song, path, w2e)
        stats.add_song(elapsed / len(songs), len(song))
        print(f"song {i}: {len(song)} tokens -> {path}")
    result = stats.dump(os.path.join(args.out_dir, "..", "runtime_stats.json")
                        if args.out_dir else "runtime_stats.json")
    print(f"ave token time: {result['ave token time:']:.1f} tokens/sec "
          f"({total_tokens} tokens in {elapsed:.2f}s)")


def cmd_serve(args):
    """Long-running generation daemon (generate/serving.py): tails a
    JSONL request file, answers each request with continuous-batched
    decode, writes MIDIs + responses.jsonl.  The model loads ONCE and
    compiled programs are reused across requests — the reference's
    inference scripts reload the model per invocation."""
    import json
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import tokenizer
    from reinforcement_learning_in_music_generation_tpu.generate import serving
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.train import (
        pretrain_lib)

    dicts = tokenizer.drop_type(tokenizer.construct_cp_dict())
    _, w2e = dicts
    vocab = tuple(tokenizer.n_classes(dicts[0]))
    mcfg = C.agent_config(vocab, n_layer=args.layers)
    if args.ckpt:
        from reinforcement_learning_in_music_generation_tpu.utils import (
            load_checkpoint)
        tmpl = lt.init_params(jax.random.PRNGKey(0), mcfg)
        params = load_checkpoint(args.ckpt, params_template=tmpl)["params"]
    else:
        params = lt.init_params(jax.random.PRNGKey(args.seed), mcfg)
    if args.dtype == "bfloat16":
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
    os.makedirs(args.out_dir, exist_ok=True)
    resp_path = os.path.join(args.out_dir, "responses.jsonl")

    def on_result(req, res):
        rid = str(req.get("id", "req"))
        paths = []
        for k, song in enumerate(res.songs):
            path = os.path.join(args.out_dir, f"{rid}_{k}.mid")
            tokenizer.write_midi_cp(np.asarray(song), path, w2e)
            paths.append(path)
        line = {"id": rid, "songs": len(res.songs), "steps": res.steps,
                "files": paths}
        with open(resp_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        print(f"served {rid}: {len(res.songs)} songs in {res.steps} steps")

    def prompt_loader(path):
        from reinforcement_learning_in_music_generation_tpu.data import (
            cp_tokenizer)
        rows = cp_tokenizer.CPEncoder().encode(path)
        return np.delete(rows, 3, axis=1)            # drop 'type'

    pretrain_lib._install_interrupt_handler()   # SIGTERM = clean drain
    print(f"serving from {args.requests} (batch {args.batch}); "
          f"shutdown: SIGTERM or a {{\"cmd\": \"shutdown\"}} line")
    n = serving.serve_requests(
        params, mcfg, args.requests, on_result, batch=args.batch,
        poll_s=args.poll, max_requests=args.max_requests,
        idle_timeout_s=args.idle_timeout,
        max_tokens_per_song=args.max_tokens,
        stop_event=pretrain_lib.INTERRUPT, prompt_loader=prompt_loader)
    print(f"served {n} requests; exiting")


def cmd_inference(args):
    """PPO-style fixed-token generation (ppo_policy/inference.py:78-161)."""
    jax = _jax()
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import tokenizer
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import linear_transformer as lt
    from reinforcement_learning_in_music_generation_tpu.ops.sampling import FieldSampling

    dicts = tokenizer.construct_tuple_dict()
    e2w, w2e = dicts
    vocab = tuple(tokenizer.n_classes(e2w))
    mcfg = C.actor_config(vocab, n_layer=args.layers)
    params = lt.init_params(jax.random.PRNGKey(args.seed), mcfg)
    if args.ckpt:
        from reinforcement_learning_in_music_generation_tpu.utils import load_checkpoint
        params = load_checkpoint(args.ckpt, params_template=params)["params"]
    gcfg = C.GenerateConfig(token_count=args.tokens, max_tokens=args.tokens,
                            batch_size=1, greedy=False, seed=args.seed)
    # plain categorical over all 6 fields (inference.py:118-134)
    settings = tuple(FieldSampling(1.0, None) for _ in range(6))
    res = sampler.generate_tokens(
        params, mcfg, jax.random.PRNGKey(args.seed),
        __import__("jax.numpy", fromlist=["jnp"]).zeros((1, 1, 6), dtype="int32"),
        max_tokens=args.tokens, token_count=args.tokens, settings=settings)
    toks = np.asarray(res.tokens[0])[np.asarray(res.valid[0])][1:]
    # clamp ids into dictionary vocab (samples may hit BOS/EOS/PAD ids)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    events = tokenizer.words_to_tuple_events(toks, w2e)
    tokenizer.tuple_events_to_midi(events, args.out)
    print(f"{len(toks)} tokens -> {args.out}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rlmg", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("prepare-data", help="MIDI -> worded data + dictionary")
    d.add_argument("--midi-folder", required=True)
    d.add_argument("--save-folder", default="./dataset")
    d.add_argument("--scheme", choices=("tuple", "cp"), default="tuple",
                   help="tuple: ppo pipeline files; cp: DQN-side "
                        "train_data_linear.npz + dictionary.pkl")
    d.add_argument("--cp-seq-len", type=int, default=3584)
    d.add_argument("--workers", type=int, default=None,
                   help="process-pool width for encoding (default: all CPUs)")
    d.set_defaults(fn=cmd_prepare_data)

    d = sub.add_parser("preprocess", help="worded data -> packed dataset")
    d.add_argument("--worded-data", default="./dataset/worded_data.pickle")
    d.add_argument("--out", default="./dataset/our_dataset.pickle")
    d.add_argument("--max-seq-len", type=int, default=1200)
    d.set_defaults(fn=cmd_preprocess)

    d = sub.add_parser(
        "split-data", help="90/10 train/test split of a worded-data pickle "
        "(ppo_policy/prepare_data.py:443-464 alt path)")
    d.add_argument("--worded-data", default="./dataset/worded_data.pickle")
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=cmd_split_data)

    def train_common(d):
        d.add_argument("--synthetic", action="store_true")
        d.add_argument("--synthetic-songs", type=int, default=16)
        d.add_argument("--seq-len", type=int, default=512)
        d.add_argument("--train-data", default=None)
        d.add_argument("--dictionary", default=None)
        d.add_argument("--layers", type=int, default=12)
        d.add_argument("--batch-size", type=int, default=4)
        d.add_argument("--lr", type=float, default=1e-4)
        d.add_argument("--epochs", type=int, default=4000)
        d.add_argument("--max-steps", type=int, default=None)
        d.add_argument("--ckpt-dir", default="./ckpt")
        d.add_argument("--exp-dir", default="./exp")
        d.add_argument("--seed", type=int, default=0)
        d.add_argument("--wandb", action="store_true")
        d.add_argument("--scan-unroll", type=int, default=1,
                       help="layer-scan unroll; 12 is ~1.45x faster for "
                            "full-model pretrain on v5e (BENCH.md)")

    d = sub.add_parser("pretrain", help="agent CE pretrain")
    train_common(d)
    d.add_argument("--vocab", default=None)
    d.add_argument("--resume", default=None,
                   help="checkpoint to resume from (params+opt state+epoch)")
    d.add_argument("--dtype", default="float32")
    d.add_argument("--dp", type=int, default=1)
    d.add_argument("--tp", type=int, default=1)
    d.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (layer slabs over a "
                        "'pp' mesh axis, microbatched ppermute pipeline; "
                        "n_layer must divide by pp, batch by dp*2*pp; "
                        "composes with --dp and --tp into a 3D mesh)")
    d.add_argument("--save-on-interrupt", action="store_true",
                   help="SIGTERM/SIGINT checkpoints to interrupt.ckpt and "
                        "exits cleanly (preemption-safe long runs)")
    d.add_argument("--ckpt-backend", choices=("pickle", "orbax"),
                   default="pickle",
                   help="orbax = async, sharded-native checkpoint dirs")
    d.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer step (gradient "
                        "accumulation; effective batch = batch-size x N)")
    d.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard Adam mu/nu over dp (optimizer "
                        "memory / dp; one update all-gather per step); "
                        "needs --dp > 1")
    d.set_defaults(fn=cmd_pretrain)

    d = sub.add_parser("discrim-pretrain", help="longformer LM pretrain")
    train_common(d)
    d.add_argument("--with-type", action="store_true")
    d.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer step (gradient "
                        "accumulation; effective batch = batch-size x N)")
    d.set_defaults(fn=cmd_discrim_pretrain)

    d = sub.add_parser("my-pretrain", help="actor/reward pretrain (ppo side)")
    d.add_argument("--lr-milestones", default="500",
                   help="MultiStepLR epochs, comma-separated "
                        "(my_pretrain.py:63-66); empty disables")
    d.add_argument("--lr-gamma", type=float, default=0.1)
    train_common(d)
    d.add_argument("--reward-pretrain", action="store_true")
    d.add_argument("--reward-layers", type=int, default=12,
                   help="reward-model depth (ppo-train's default reward is "
                        "layers-2, i.e. 10 for the 12L actor)")
    d.set_defaults(fn=cmd_my_pretrain)

    d = sub.add_parser("data-midi", help="decode a dataset row to MIDI")
    d.add_argument("--dataset", default="./dataset/our_dataset.pickle")
    d.add_argument("--dictionary", default="./dataset/dictionary.pickle")
    d.add_argument("--row", type=int, default=10)
    d.add_argument("--out", default="./gen_midi/111.mid")
    d.set_defaults(fn=cmd_data_midi)

    d = sub.add_parser("dqn-train", help="DQN + AIRL fine-tune")
    train_common(d)
    d.add_argument("--songs", type=int, default=1500)
    d.add_argument("--episodes", type=int, default=50)
    d.add_argument("--buffer-size", type=int, default=20000)
    d.add_argument("--n-states", type=int, default=50)
    d.add_argument("--n-actions", type=int, default=25)
    d.add_argument("--pretrain-ckpt", default=None)
    d.add_argument("--retrain-disc", action="store_true")
    d.add_argument("--max-updates", type=int, default=None)
    d.add_argument("--disc-epochs", type=int, default=5,
                   help="AIRL discriminator epochs per training pass")
    d.add_argument("--disc-lr", type=float, default=0.001,
                   help="disc Adam lr.  The default 1e-3 is the "
                        "reference's value (AIRL.py:170), kept for "
                        "parity even though it collapses the 10L "
                        "discriminator to a constant 0.5 on v5e runs "
                        "(BCEs pin at ln2).  Pass 1e-4 for a "
                        "discriminator that actually separates "
                        "expert/agent (measured, BENCH.md r3 "
                        "learning-effect section)")
    d.add_argument("--disc-lr-step", type=int, default=10,
                   help="disc StepLR period in MINIBATCHES (the reference "
                        "steps its scheduler per minibatch, AIRL.py:176, "
                        "so lr dies ~30 minibatches in; raise for longer "
                        "effective disc training)")
    d.add_argument("--ckpt-epoch-gate", type=int, default=410,
                   help="first epoch eligible for dqn_best.ckpt + the "
                        "agent_info.pickle record (IRL_dqn_train.py:362)")
    d.add_argument("--score-batch-size", type=int, default=100,
                   help="AIRL buffer re-scoring batch.  WARNING: this "
                        "changes reward VALUES, not just throughput — the "
                        "reference scores with per-batch BatchNorm "
                        "statistics (train-mode BN, AIRL.py:69-90; "
                        "PARITY.md #15), so each transition's reward "
                        "depends on which transitions share its scoring "
                        "batch.  Default 100 matches the reference")
    d.add_argument("--dp", type=int, default=1)
    d.add_argument("--tp", type=int, default=1)
    d.set_defaults(fn=cmd_dqn_train)

    d = sub.add_parser("ppo-train", help="PPO fine-tune")
    train_common(d)
    d.add_argument("--songs", type=int, default=1000)
    d.add_argument("--episodes", type=int, default=30)
    d.add_argument("--n-states", type=int, default=50)
    d.add_argument("--n-actions", type=int, default=25)
    d.add_argument("--ppo-steps", type=int, default=10)
    d.add_argument("--pretrain-actor", default=None)
    d.add_argument("--pretrain-reward", default=None,
                   help="reward-model ckpt from my-pretrain --reward-pretrain")
    d.add_argument("--dp", type=int, default=1)
    d.add_argument("--tp", type=int, default=1)
    d.add_argument("--compat-forward-returns", action="store_true",
                   help="reproduce the reference's forward-order reward "
                        "discounting (ppo_train.py:348-357, SURVEY §2.6#6)")
    d.set_defaults(fn=cmd_ppo_train)

    d = sub.add_parser("generate", help="unconditional generation (CP)")
    d.add_argument("--songs", type=int, default=5)
    d.add_argument("--bars", type=int, default=50)
    d.add_argument("--max-tokens", type=int, default=4096)
    d.add_argument("--layers", type=int, default=12)
    d.add_argument("--greedy", action="store_true")
    d.add_argument("--ckpt", default=None)
    d.add_argument("--out-dir", default="gen_midis")
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--warmup", action="store_true",
                   help="compile+run once before timing (honest tokens/sec)")
    d.add_argument("--prompt", default=None,
                   help="MIDI file to continue from (CP-encoded seed)")
    d.add_argument("--prompt-tokens", type=int, default=None)
    d.add_argument("--continuous", action="store_true",
                   help="continuous batching: refill slots in-graph the "
                        "moment a song completes (serving mode; right "
                        "for --songs >> batch)")
    d.add_argument("--continuous-batch", type=int, default=None,
                   help="slot count for --continuous (default "
                        "min(songs, 8))")
    d.add_argument("--dp", type=int, default=1)
    d.add_argument("--tp", type=int, default=1)
    d.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="decode weight dtype (bf16 halves HBM traffic)")
    d.set_defaults(fn=cmd_generate)

    d = sub.add_parser("serve", help="generation daemon over a JSONL "
                                     "request file (continuous batching)")
    d.add_argument("--requests", required=True,
                   help="JSONL file to tail: {\"id\", \"songs\", "
                        "\"bars\", \"seed\"}; {\"cmd\": "
                        "\"shutdown\"} stops")
    d.add_argument("--out-dir", default="served")
    d.add_argument("--batch", type=int, default=8)
    d.add_argument("--layers", type=int, default=12)
    d.add_argument("--ckpt", default=None)
    d.add_argument("--dtype", default="float32")
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--poll", type=float, default=0.5)
    d.add_argument("--max-tokens", type=int, default=4096)
    d.add_argument("--max-requests", type=int, default=None)
    d.add_argument("--idle-timeout", type=float, default=None)
    d.set_defaults(fn=cmd_serve)

    d = sub.add_parser("inference", help="PPO-style fixed-token generation")
    d.add_argument("--tokens", type=int, default=150)
    d.add_argument("--layers", type=int, default=12)
    d.add_argument("--ckpt", default=None)
    d.add_argument("--out", default="gen_midi/pretrain_actor.mid")
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=cmd_inference)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
