"""Configuration tree for the framework.

The reference scatters constants across per-script module blocks
(dqn_policy/config.py:11-24, ppo_policy/config.py:18-58,
dqn_policy/agent_pretrain.py:38-54, dqn_policy/IRL_dqn_train.py:33-65,
ppo_policy/ppo_train.py:21-57).  Here they are a single dataclass tree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LinearTransformerConfig:
    """Causal linear-attention transformer (dqn_policy/model.py:97-161,
    dqn_policy/config.py:11-15; ppo ActorConfig ppo_policy/config.py:39-43)."""

    vocab_sizes: Tuple[int, ...] = (56, 135, 18, 87, 18, 25)
    emb_sizes: Tuple[int, ...] = (128, 256, 64, 512, 128, 128)
    d_model: int = 512
    n_layer: int = 12
    n_head: int = 8
    d_inner: int = 2048
    dropout: float = 0.1
    max_len: int = 20000           # sinusoidal table size (model.py:78)
    attn_eps: float = 1e-6         # linear-attention denominator epsilon
    attn_chunk: int = 128          # linear-attention chunk length
    attn_backend: Optional[str] = None  # 'pallas'/'xla'; None = auto/env
    scan_unroll: int = 1           # layer-scan unroll for training fwd/bwd
    remat: bool = False            # jax.checkpoint each layer: trades ~30%
                                   # recompute for O(L*B*S*D) activation
                                   # memory — enables batch >= 128 training
                                   # (B=128 fwd+bwd needs 17.5GB un-rematted)
    with_value_head: bool = False  # PPO actor adds one (ppo model.py:154-158)
    dtype: str = "float32"         # activation dtype ("bfloat16" for speed)

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    @property
    def n_fields(self) -> int:
        return len(self.vocab_sizes)


@dataclasses.dataclass(frozen=True)
class WindowTransformerConfig:
    """Longformer-style sliding-window encoder.

    Three reference variants:
      * AIRL discriminator: 10 layers, window 50, max_pos 2048, score head
        (dqn_policy/AIRL_model.py:78-99)
      * PPO reward model: 12 layers, window 512, max_pos 2048, eval heads
        (ppo_policy/model.py:400-451, ppo_policy/config.py:53-58)
      * discrim-pretrain LM: 12 layers, window 512, max_pos 4096, absolute
        positions, 7 fields (dqn_policy/discrim-pretrain.py:239-249)
    """

    vocab_sizes: Tuple[int, ...] = (56, 135, 18, 87, 18, 25)
    emb_sizes: Tuple[int, ...] = (128, 256, 64, 512, 256, 256)
    d_model: int = 512
    n_layer: int = 10
    n_head: int = 8
    d_inner: int = 1024
    dropout: float = 0.1
    max_pos: int = 2048
    attention_window: int = 50      # full window (w/2 on each side)
    position_embedding_type: str = "absolute"  # or "relative_key"
    scan_unroll: int = 1            # layer-scan unroll for training fwd/bwd
    with_score_head: bool = True    # score_classifier MLP (AIRL_model.py:91-99)
    with_eval_heads: bool = False   # per-field scalar eval heads (IRL_model.py)
    dtype: str = "float32"

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    @property
    def n_fields(self) -> int:
        return len(self.vocab_sizes)


# Named model presets matching the reference variants --------------------------

def agent_config(vocab_sizes=(56, 135, 18, 87, 18, 25), **kw) -> LinearTransformerConfig:
    """dqn_policy/config.py:11-15 AgentConfig (D_MODEL 512, 12L, 8H)."""
    return LinearTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


def actor_config(vocab_sizes=(49, 19, 19, 89, 67, 25), **kw) -> LinearTransformerConfig:
    """ppo_policy/config.py:39-43 ActorConfig + value head (model.py:154-158)."""
    kw.setdefault("with_value_head", True)
    return LinearTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


def critic_config(vocab_sizes=(49, 19, 19, 89, 67, 25), **kw) -> LinearTransformerConfig:
    """ppo_policy/config.py:45-49 CriticConfig (critic adds field value heads)."""
    return LinearTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


def airl_discriminator_config(vocab_sizes=(56, 135, 18, 87, 18, 25), **kw) -> WindowTransformerConfig:
    """dqn_policy/AIRL_model.py:78-90 (10L, window 50).

    The reference config *requests* ``position_embedding_type="relative_key"``
    (AIRL_model.py:85), but HF's LongformerSelfAttention never reads that
    setting — the model it builds applies absolute learned positions only
    (see models/longformer.py module docstring).  The faithful default is
    therefore "absolute"; pass position_embedding_type="relative_key" to get
    a *real* relative-score term the reference never computes."""
    kw.setdefault("n_layer", 10)
    kw.setdefault("attention_window", 50)
    kw.setdefault("max_pos", 2048)
    kw.setdefault("position_embedding_type", "absolute")
    kw.setdefault("with_score_head", True)
    return WindowTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


def ppo_reward_config(vocab_sizes=(49, 19, 19, 89, 67, 25), **kw) -> WindowTransformerConfig:
    """ppo_policy/model.py:400-451 reward model (12L, window 512).

    Defaults to absolute positions for the same reason as
    airl_discriminator_config: HF Longformer ignores the reference's
    "relative_key" request (ppo_policy/model.py:448), so absolute is the
    behavior the reference actually ran."""
    kw.setdefault("n_layer", 12)
    kw.setdefault("attention_window", 512)
    kw.setdefault("max_pos", 2048)
    kw.setdefault("position_embedding_type", "absolute")
    kw.setdefault("with_score_head", False)
    kw.setdefault("with_eval_heads", True)
    return WindowTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


def discrim_lm_config(vocab_sizes=(56, 135, 18, 3, 87, 18, 25), **kw) -> WindowTransformerConfig:
    """dqn_policy/discrim-pretrain.py:239-249 LM variant (7 fields incl type)."""
    kw.setdefault("n_layer", 12)
    kw.setdefault("attention_window", 512)
    kw.setdefault("max_pos", 4096)
    kw.setdefault("position_embedding_type", "absolute")
    kw.setdefault("with_score_head", False)
    kw.setdefault("emb_sizes", (128, 256, 64, 32, 512, 256, 128))
    return WindowTransformerConfig(vocab_sizes=tuple(vocab_sizes), **kw)


# ---------------------------------------------------------------------------
# Training / RL configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """Agent pretrain loop (dqn_policy/agent_pretrain.py:38-54,516)."""

    n_epoch: int = 4000
    batch_size: int = 4
    lr: float = 1e-4
    grad_clip: float = 3.0
    early_stop_loss: float = 0.05   # agent_pretrain.py:629-632
    ckpt_dir: str = "./ckpt"
    exp_dir: str = "./exp"
    seed: int = 0
    log_every: int = 10             # batches between host-side loss fetches
    prng_impl: str = "rbg"          # dropout PRNG; rbg is ~11% faster than
                                    # threefry on TPU at these shapes
    # MultiStepLR in *epochs* (torch scheduler.step() per epoch) —
    # ppo_policy/my_pretrain.py:63-66 uses milestones=[500], gamma=0.1
    lr_milestones: Tuple[int, ...] = ()
    lr_gamma: float = 0.1
    zero1: bool = False             # shard Adam mu/nu over the mesh's dp
                                    # axis (train/optim.py:zero1); needs a
                                    # mesh with dp > 1
    prefetch_depth: int = 2         # host->device input look-ahead
                                    # (train/data_pipeline.py); 1 = inline
    grad_accum: int = 1             # micro-batches per optimizer step
                                    # (sum of 1/K-scaled grads == mean
                                    # gradient of the K-fold batch)
    ckpt_backend: str = "pickle"    # "pickle" (portable, host-gathered)
                                    # or "orbax" (async, sharded-native)
    save_on_interrupt: bool = False  # install a SIGTERM/SIGINT handler
                                     # that checkpoints + exits cleanly
                                     # (TPU-pod preemption contract)


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """DQN + AIRL fine-tune (dqn_policy/IRL_dqn_train.py:42-65)."""

    num_songs: int = 1500
    episodes: int = 50
    seq_len: int = 1000
    n_states: int = 50              # window / state size
    n_actions: int = 25
    n_features: int = 6
    buffer_size: int = 20000
    batch_size: int = 30
    lr: float = 0.01
    lr_milestones: Tuple[int, ...] = (20, 40)
    lr_gamma: float = 0.1
    gamma: float = 0.95             # reward discount
    target_update: int = 50
    alpha: float = 0.3              # 0.3*MSE + 0.7*CE (IRL_dqn_train.py:332-336)
    ckpt_epoch_gate: int = 410      # checkpoint gate (IRL_dqn_train.py:362)
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class AIRLConfig:
    """AIRL discriminator trainer (dqn_policy/AIRL.py:51-58)."""

    lr: float = 0.001
    epochs: int = 5
    batch_size: int = 100
    lr_step: int = 10
    lr_gamma: float = 0.1
    # buffer re-scoring batch (pure inference).  Swept on chip r5
    # (BENCH.md): 100 is the optimum — 0.861 s/pass vs 1.03/1.41/1.61 at
    # 500/1000/2000 over the 20k double buffer.  The dense (B,H,S,S)
    # attention score tensors are the HBM cost and scale with batch, so
    # bigger inference batches LOSE, and BN-train-mode scores drift from
    # the reference's bs=100 semantics (~0.004 at 500+); kept as a knob
    score_batch_size: int = 100


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """PPO fine-tune (ppo_policy/ppo_train.py:34-57)."""

    num_songs: int = 1000
    episodes: int = 30
    n_states: int = 50
    n_actions: int = 25
    n_features: int = 6
    ppo_steps: int = 10
    ppo_clip: float = 0.2
    discount: float = 0.99
    lr: float = 0.01
    seed: int = 0
    # Reference discounts rewards in *forward* order (ppo_train.py:348-357,
    # SURVEY §2.6#6).  Default fixes it; set True to reproduce.
    compat_forward_returns: bool = False


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    """Generation entry (dqn_policy/testing-no-type-cp.py:33-35,
    ppo_policy/config.py:30)."""

    n_songs: int = 5
    bar_production: int = 50
    max_tokens: int = 4096          # static scan length upper bound
    token_count: Optional[int] = None  # PPO-style fixed token budget (=150)
    greedy: bool = False
    batch_size: int = 1             # songs generated simultaneously
    out_dir: str = "gen_midis"
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit (green-field; SURVEY §2.5)."""

    dp: int = -1    # -1: infer from device count / tp
    tp: int = 1

    def axis_sizes(self, n_devices: int) -> Tuple[int, int]:
        tp = max(1, self.tp)
        dp = self.dp if self.dp > 0 else max(1, n_devices // tp)
        return dp, tp
