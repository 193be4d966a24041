"""Fixed-shape on-device replay buffers.

The reference keeps numpy ring buffers on the host and round-trips every
transition GPU->CPU->GPU (dqn_policy/IRL_dqn_train.py:78-204,
ppo_policy/ppo_train.py:69-212).  Here a buffer is a jnp pytree (a dict of
fixed-shape arrays + a counter) updated with `.at[]` under jit, so rollout,
storage, sampling and updates stay on-device.

Agent layout (IRL_dqn_train.py:80-86): state (50,6), action (25,6),
reward (1,), next_state (50,6), done (1,).  The expert variant adds
state/next-state masks (:144-146).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    data: Dict[str, jax.Array]   # each (capacity, ...)
    counter: jax.Array           # () int32 total stores (monotonic)

    @property
    def capacity(self) -> int:
        return next(iter(self.data.values())).shape[0]


def agent_field_specs(n_states=50, n_actions=25, n_features=6) -> Dict[str, Tuple]:
    return {
        "state": ((n_states, n_features), jnp.int32),
        "action": ((n_actions, n_features), jnp.int32),
        "reward": ((1,), jnp.float32),
        "next_state": ((n_states, n_features), jnp.int32),
        "done": ((1,), jnp.int32),
    }


def expert_field_specs(n_states=50, n_actions=25, n_features=6) -> Dict[str, Tuple]:
    specs = agent_field_specs(n_states, n_actions, n_features)
    specs["mask_state"] = ((n_states,), jnp.float32)
    specs["mask_next_state"] = ((n_states,), jnp.float32)
    return specs


def ppo_field_specs(n_states=50, n_actions=25, n_features=6) -> Dict[str, Tuple]:
    """PPO adds value and per-action log-probs (ppo_train.py:71-79)."""
    specs = agent_field_specs(n_states, n_actions, n_features)
    specs["value"] = ((1,), jnp.float32)
    specs["log_action"] = ((n_actions, n_features), jnp.float32)
    return specs


def buffer_init(capacity: int, specs: Dict[str, Tuple]) -> ReplayBuffer:
    data = {k: jnp.zeros((capacity,) + shape, dtype)
            for k, (shape, dtype) in specs.items()}
    return ReplayBuffer(data=data, counter=jnp.zeros((), jnp.int32))


@jax.jit
def buffer_store(buf: ReplayBuffer, transition: Dict[str, jax.Array]) -> ReplayBuffer:
    cap = buf.capacity
    idx = buf.counter % cap
    data = {k: buf.data[k].at[idx].set(v.astype(buf.data[k].dtype))
            for k, v in transition.items()}
    return ReplayBuffer(data=data, counter=buf.counter + 1)


@jax.jit
def buffer_store_batch(buf: ReplayBuffer, transitions: Dict[str, jax.Array]) -> ReplayBuffer:
    """Store a stacked batch (T, ...) of transitions in ring order."""
    cap = buf.capacity
    t = next(iter(transitions.values())).shape[0]
    idxs = (buf.counter + jnp.arange(t)) % cap
    data = {k: buf.data[k].at[idxs].set(v.astype(buf.data[k].dtype))
            for k, v in transitions.items()}
    return ReplayBuffer(data=data, counter=buf.counter + t)


@functools.partial(jax.jit, static_argnames=("batch_size",))
def buffer_sample(buf: ReplayBuffer, rng: jax.Array,
                  batch_size: int) -> Dict[str, jax.Array]:
    """Uniform over the whole capacity — np.random.choice(BUFFER_SIZE, batch)
    (IRL_dqn_train.py:107); the reference only samples once full."""
    idx = jax.random.randint(rng, (batch_size,), 0, buf.capacity)
    return {k: v[idx] for k, v in buf.data.items()}


def buffer_get(buf: ReplayBuffer) -> Dict[str, jax.Array]:
    return dict(buf.data)


def buffer_size(buf: ReplayBuffer) -> int:
    return int(jnp.minimum(buf.counter, buf.capacity))
