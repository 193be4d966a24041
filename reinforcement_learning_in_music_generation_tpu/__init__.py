"""TPU-native reimplementation of `Reinforcement-Learning-in-Music-Generation`.

A from-scratch JAX/XLA/Pallas framework for symbolic (MIDI) pop-piano music
generation with RL fine-tuning, with the same capabilities as the PyTorch/CUDA
reference (`daniel05155/Reinforcement-Learning-in-Music-Generation`):

- compound-word (CP) / tuple-event MIDI tokenizers (reference:
  ppo_policy/prepare_data.py, ppo_policy/utils.py)
- causal linear-attention transformer agent with O(1)-state recurrent decode
  (reference: dqn_policy/model.py, via `pytorch-fast-transformers`)
- Longformer-style sliding-window discriminators / reward models
  (reference: dqn_policy/AIRL_model.py, ppo_policy/IRL_model.py)
- DQN + AIRL and PPO + learned-reward fine-tuning pipelines
  (reference: dqn_policy/IRL_dqn_train.py, ppo_policy/ppo_train.py)
- autoregressive generation with per-field temperature/nucleus sampling
  (reference: dqn_policy/testing-no-type-cp.py)

Everything on the compute path is JAX (jit/pjit/shard_map + Pallas TPU
kernels); host-side MIDI encode/decode is vectorized numpy with no external
MIDI dependency.

Import convention::

    import reinforcement_learning_in_music_generation_tpu as rlmg
"""

__version__ = "0.1.0"

FIELDS = ("tempo", "chord", "barbeat", "pitch", "duration", "velocity")
"""Per-token compound-word fields, in storage order (dqn_policy/model.py:110)."""
