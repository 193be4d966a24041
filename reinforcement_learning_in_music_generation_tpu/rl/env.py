"""Teacher-forced token "environment" rollouts as device-resident scans.

The reference's env loop (dqn_policy/IRL_dqn_train.py:442-498,
ppo_policy/ppo_train.py:460-497) steps one episode at a time in python:
slide expert windows over the song, run the agent on the current 50-token
state, build next_state = concat(state[:25], action), store to host
buffers.  Here the whole song's episode loop is one `lax.scan` producing
stacked transitions, with the expert windows gathered by dynamic slices.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import LinearTransformerConfig
from . import dqn as dqn_lib


@functools.partial(jax.jit, static_argnames=("mcfg", "episodes", "n_states",
                                             "n_actions"))
def dqn_rollout_song(params: dict, mcfg: LinearTransformerConfig,
                     song_x: jax.Array, expert_y: jax.Array,
                     song_mask: jax.Array, *, episodes: int = 50,
                     n_states: int = 50, n_actions: int = 25
                     ) -> Tuple[Dict, Dict]:
    """One song's episode loop (IRL_dqn_train.py:442-470).

    song_x: (S0, 6) agent stream; expert_y: (S1, 6) expert stream with
    S1 >= episodes + 2*n_states; song_mask: (S1,) mask.
    Returns (agent_transitions, expert_transitions), each stacked (episodes, ...).
    """
    state0 = song_x[:n_states]

    def body(state, num):
        exp_state = jax.lax.dynamic_slice_in_dim(expert_y, num, n_states)
        exp_next = jax.lax.dynamic_slice_in_dim(expert_y, num + n_states, n_states)
        mask_state = jax.lax.dynamic_slice_in_dim(song_mask, num, n_states)
        mask_next = jax.lax.dynamic_slice_in_dim(song_mask, num + 1, n_states)
        action = dqn_lib.choose_action(params, mcfg, state[None],
                                       n_actions=n_actions)[0]
        next_state = jnp.concatenate([state[:n_actions], action], axis=0)
        agent_t = {
            "state": state, "action": action,
            "reward": jnp.array([0.5], jnp.float32),   # placeholder (:463)
            "next_state": next_state,
            "done": jnp.array([0], jnp.int32),
        }
        expert_t = {
            "state": exp_state, "action": action,
            "reward": jnp.array([1.0], jnp.float32),
            "next_state": exp_next,
            "done": jnp.array([0], jnp.int32),
            "mask_state": mask_state.astype(jnp.float32),
            "mask_next_state": mask_next.astype(jnp.float32),
        }
        return next_state, (agent_t, expert_t)

    _, (agent_ts, expert_ts) = jax.lax.scan(
        body, state0, jnp.arange(episodes))
    return agent_ts, expert_ts
