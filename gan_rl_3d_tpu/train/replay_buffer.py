"""Device-resident ring replay buffer.

Replaces the reference's host-side deque of namedtuples with per-sample
tensor conversion (rl_agent.py:136-166) — the TD3 loop's main host<->device
bottleneck. Here the buffer is a pytree of fixed-size device arrays with a
write pointer; batched insert and uniform sampling are pure jnp and live
inside the jitted RL step, so transitions never leave HBM.

Deviation from the reference: sampling is uniform *with* replacement
(jax.random.randint) instead of Python random.sample without replacement —
at buffer sizes >> batch size the distributions are indistinguishable and
the with-replacement form is a single gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.models.rl_agent import TransitionBatch

Array = jax.Array


class ReplayBuffer(NamedTuple):
    states: Array       # (capacity, state_dim)
    actions: Array      # (capacity, action_dim)
    rewards: Array      # (capacity, 1)
    next_states: Array  # (capacity, state_dim)
    dones: Array        # (capacity, 1)
    ptr: Array          # () int32 — next write position
    size: Array         # () int32 — valid entries


def buffer_init(capacity: int, state_dim: int = 128,
                action_dim: int = 1) -> ReplayBuffer:
    return ReplayBuffer(
        states=jnp.zeros((capacity, state_dim), jnp.float32),
        actions=jnp.zeros((capacity, action_dim), jnp.float32),
        rewards=jnp.zeros((capacity, 1), jnp.float32),
        next_states=jnp.zeros((capacity, state_dim), jnp.float32),
        dones=jnp.zeros((capacity, 1), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def buffer_add_batch(buf: ReplayBuffer, batch: TransitionBatch) -> ReplayBuffer:
    """Write a whole batch of transitions at the ring pointer."""
    n = batch.states.shape[0]
    capacity = buf.states.shape[0]
    idx = (buf.ptr + jnp.arange(n)) % capacity
    return ReplayBuffer(
        states=buf.states.at[idx].set(batch.states),
        actions=buf.actions.at[idx].set(batch.actions),
        rewards=buf.rewards.at[idx].set(batch.rewards),
        next_states=buf.next_states.at[idx].set(batch.next_states),
        dones=buf.dones.at[idx].set(batch.dones),
        ptr=(buf.ptr + n) % capacity,
        size=jnp.minimum(buf.size + n, capacity),
    )


def buffer_sample(buf: ReplayBuffer, key, batch_size: int) -> TransitionBatch:
    """Uniform sample over the valid region (requires size >= 1)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    return TransitionBatch(
        states=buf.states[idx],
        actions=buf.actions[idx],
        rewards=buf.rewards[idx],
        next_states=buf.next_states[idx],
        dones=buf.dones[idx],
    )
