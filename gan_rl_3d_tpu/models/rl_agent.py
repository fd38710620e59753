"""TD3 agent controlling the latent GAN's z-vector.

Capability parity with reference models/rl_agent.py:16-395 (class "DDPGAgent"
— actually TD3: twin critics + target nets + delayed policy update + target
policy smoothing, rl_agent.py:222-343). Redesigned as pure functions over an
agent pytree so the entire update is one jitted step and whole batches of
environment transitions are processed at once (the reference steps batch=1
Python episodes, train_rl_gan_net.py:388-429).

Architectures (identical dims for parity):
* Actor 128 -> [400, 400, 300, 300] (+BN+ReLU) -> 1 + Tanh, xavier-uniform
  weights / 0.01 bias (rl_agent.py:16-69).
* Critic: state branch 128->400 (+BN+ReLU) ⊕ action branch 1->32 (ReLU),
  concat -> 300 -> 300 (+BN+ReLU) -> 1 (rl_agent.py:72-133).

torch-matching state-handling quirks kept deliberately:
* action selection runs the actor in eval mode (running BN stats) —
  rl_agent.py:258-265;
* target networks run in train mode during updates (batch BN stats, their
  running stats advance) because the reference never flips them to eval;
* soft target updates blend parameters only — BN buffers are not blended
  (torch iterates .parameters(), rl_agent.py:358-367).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.models.common import bn_mlp_apply, bn_mlp_init

Array = jax.Array


class TD3Config(NamedTuple):
    """Static hyper-parameters (hashable; safe as a jit static arg)."""

    state_dim: int = 128
    action_dim: int = 1
    actor_hidden: Tuple[int, ...] = (400, 400, 300, 300)
    critic_hidden: Tuple[int, ...] = (400, 432, 300, 300)
    actor_lr: float = 1e-4
    critic_lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 64
    exploration_noise: float = 0.1
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    policy_delay: int = 2
    # TPU addition: skip actor (policy) updates for the first N TD3 updates
    # so the twin critics settle before the policy starts following them.
    # 0 = reference behaviour. Motivation: on the attention/adaptive
    # variant the default schedule collapses the policy within ~450
    # episodes, and even the primary architecture shows a transient
    # critic-misled dip at scale (runs/{variant,best2}/RESULTS.md).
    actor_warmup: int = 0
    # TPU addition: after the warmup gate opens, ramp the effective actor
    # lr linearly from ~0 up to actor_lr over this many applied policy
    # updates (implemented as a post-Adam update scale keyed off the TD3
    # step counter — see _actor_ramp_factor). 0 = constant actor_lr
    # (reference behaviour). Motivation: the variant architecture's
    # reward landscape needs a gentler policy-update onset than the
    # primary's — warmup alone holds the collapse off but full-rate
    # updates afterwards stay flat (runs/variant/RESULTS.md).
    actor_lr_ramp: int = 0
    action_bound: float = 1.0
    # OU noise process (rl_agent.py:169-192)
    ou_mu: float = 0.0
    ou_theta: float = 0.15
    ou_sigma: float = 0.2
    ou_dt: float = 1e-2


# ---------------------------------------------------------------------------
# Actor
# ---------------------------------------------------------------------------


def actor_init(key, cfg: TD3Config) -> Tuple[dict, dict]:
    dims = list(cfg.actor_hidden) + [cfg.action_dim]
    p, s = bn_mlp_init(key, cfg.state_dim, dims, w_init=nn.xavier_uniform,
                       bias_const=0.01, final_plain=True)
    return {"mlp": p}, {"mlp": s}


def actor_apply(params, state, s, *, cfg: TD3Config,
                training: bool = False) -> Tuple[Array, dict]:
    a, mlp_s = bn_mlp_apply(params["mlp"], state["mlp"], s, training=training,
                            final_activation=jnp.tanh)
    return a * cfg.action_bound, {"mlp": mlp_s}


# ---------------------------------------------------------------------------
# Critic
# ---------------------------------------------------------------------------


def _critic_widths(hidden: Tuple[int, ...]) -> Tuple[int, int, int]:
    """Layer widths (state, combined1, combined2) from critic_hidden.

    The reference's 4-element critic_hidden_dims has a vestigial slot:
    hidden_dims[1] = 432 merely *documents* the derived 400 + 32
    state+action concat width and is never read as a layer size
    (reference models/rl_agent.py:78-98, see its ':89' comment). A
    4-element tuple keeps those semantics (slot 1 ignored) for checkpoint
    parity; a 3-element tuple names only the real widths."""
    if len(hidden) == 4:
        return hidden[0], hidden[2], hidden[3]
    if len(hidden) == 3:
        return hidden[0], hidden[1], hidden[2]
    raise ValueError(f"critic_hidden must have 3 or 4 entries, got {hidden}")


def critic_init(key, cfg: TD3Config) -> Tuple[dict, dict]:
    h_state, h_comb1, h_comb2 = _critic_widths(cfg.critic_hidden)
    ks = jax.random.split(key, 5)
    init = dict(w_init=nn.xavier_uniform, bias_const=0.01)
    params = {
        "state_fc": nn.dense_init(ks[0], cfg.state_dim, h_state, **init),
        "action_fc": nn.dense_init(ks[1], cfg.action_dim, 32, **init),
        "comb_fc1": nn.dense_init(ks[2], h_state + 32, h_comb1, **init),
        "comb_fc2": nn.dense_init(ks[3], h_comb1, h_comb2, **init),
        "out_fc": nn.dense_init(ks[4], h_comb2, 1, **init),
    }
    bn1_p, bn1_s = nn.batchnorm_init(h_state)
    bn2_p, bn2_s = nn.batchnorm_init(h_comb1)
    bn3_p, bn3_s = nn.batchnorm_init(h_comb2)
    params.update({"bn1": bn1_p, "bn2": bn2_p, "bn3": bn3_p})
    state = {"bn1": bn1_s, "bn2": bn2_s, "bn3": bn3_s}
    return params, state


def critic_apply(params, state, s, a, *, training: bool = False
                 ) -> Tuple[Array, dict]:
    x = nn.dense_apply(params["state_fc"], s)
    x, bn1 = nn.batchnorm_apply(params["bn1"], state["bn1"], x,
                                training=training)
    x = jax.nn.relu(x)
    av = jax.nn.relu(nn.dense_apply(params["action_fc"], a))
    x = jnp.concatenate([x, av], axis=-1)
    x = nn.dense_apply(params["comb_fc1"], x)
    x, bn2 = nn.batchnorm_apply(params["bn2"], state["bn2"], x,
                                training=training)
    x = jax.nn.relu(x)
    x = nn.dense_apply(params["comb_fc2"], x)
    x, bn3 = nn.batchnorm_apply(params["bn3"], state["bn3"], x,
                                training=training)
    x = jax.nn.relu(x)
    q = nn.dense_apply(params["out_fc"], x)
    return q, {"bn1": bn1, "bn2": bn2, "bn3": bn3}


# ---------------------------------------------------------------------------
# Ornstein-Uhlenbeck exploration noise (explicit state)
# ---------------------------------------------------------------------------


def ou_init(cfg: TD3Config, batch_shape: Tuple[int, ...] = ()) -> Array:
    return jnp.full(batch_shape + (cfg.action_dim,), cfg.ou_mu, jnp.float32)


def ou_step(key, ou_state: Array, cfg: TD3Config) -> Array:
    """One OU step; works for (action_dim,) or batched (B, action_dim)."""
    dx = (cfg.ou_theta * (cfg.ou_mu - ou_state) * cfg.ou_dt
          + cfg.ou_sigma * jnp.sqrt(cfg.ou_dt)
          * jax.random.normal(key, ou_state.shape))
    return ou_state + dx


# ---------------------------------------------------------------------------
# Agent bundle
# ---------------------------------------------------------------------------


def _optims(cfg: TD3Config):
    return (optax.adam(cfg.actor_lr), optax.adam(cfg.critic_lr),
            optax.adam(cfg.critic_lr))


def _actor_ramp_factor(step, cfg: TD3Config):
    """Warmup-then-ramp actor lr multiplier, derived from the TD3 step
    counter so the optimizer-state STRUCTURE stays identical to the
    constant-lr agent (an optax schedule would add a count leaf and break
    restore of every pre-ramp checkpoint). Applied to the post-Adam
    update, which is exactly lr scaling. ``applied`` approximates the
    number of policy updates fired since the warmup gate opened
    (policy_delay cadence)."""
    if cfg.actor_lr_ramp <= 0:
        return jnp.float32(1.0)
    applied = jnp.maximum(step.astype(jnp.float32) - cfg.actor_warmup,
                          0.0) / max(cfg.policy_delay, 1)
    return jnp.clip(applied / float(cfg.actor_lr_ramp),
                    1.0 / float(cfg.actor_lr_ramp), 1.0)


def agent_init(key, cfg: TD3Config) -> dict:
    ks = jax.random.split(key, 3)
    actor_p, actor_s = actor_init(ks[0], cfg)
    c1_p, c1_s = critic_init(ks[1], cfg)
    c2_p, c2_s = critic_init(ks[2], cfg)
    opt_a, opt_c1, opt_c2 = _optims(cfg)
    return {
        "actor": {"params": actor_p, "state": actor_s},
        "critic1": {"params": c1_p, "state": c1_s},
        "critic2": {"params": c2_p, "state": c2_s},
        # targets start as exact copies (torch copy.deepcopy,
        # rl_agent.py:227-229)
        "actor_target": {"params": actor_p, "state": actor_s},
        "critic1_target": {"params": c1_p, "state": c1_s},
        "critic2_target": {"params": c2_p, "state": c2_s},
        "opt": {
            "actor": opt_a.init(actor_p),
            "critic1": opt_c1.init(c1_p),
            "critic2": opt_c2.init(c2_p),
        },
        "step": jnp.zeros((), jnp.int32),
    }


def select_action(
    agent: dict,
    s: Array,
    cfg: TD3Config,
    *,
    key: Optional[Array] = None,
    ou_state: Optional[Array] = None,
    add_noise: bool = True,
) -> Tuple[Array, Optional[Array]]:
    """Batched action selection, actor in eval mode (rl_agent.py:245-271).

    s: (B, state_dim) or (state_dim,). With ``add_noise``, each batch row
    carries its own OU chain (``ou_state`` (B, action_dim)); actions are
    clipped to [-1, 1].
    """
    single = s.ndim == 1
    if single:
        s = s[None]
    a, _ = actor_apply(agent["actor"]["params"], agent["actor"]["state"], s,
                       cfg=cfg, training=False)
    new_ou = ou_state
    if add_noise:
        assert key is not None and ou_state is not None
        new_ou = ou_step(key, ou_state, cfg)
        a = jnp.clip(a + cfg.exploration_noise * new_ou, -1.0, 1.0)
    if single:
        a = a[0]
    return a, new_ou


class TransitionBatch(NamedTuple):
    states: Array       # (B, state_dim)
    actions: Array      # (B, action_dim)
    rewards: Array      # (B, 1)
    next_states: Array  # (B, state_dim)
    dones: Array        # (B, 1) float 0/1


def agent_update(agent: dict, batch: TransitionBatch, key,
                 cfg: TD3Config) -> Tuple[dict, dict]:
    """One TD3 update (reference update/_update_critics/_update_actor/
    _update_targets, rl_agent.py:278-367). Pure; jit with cfg static.

    Returns (new_agent, metrics{'critic_loss', 'actor_loss'}).
    """
    opt_a, opt_c1, opt_c2 = _optims(cfg)
    step = agent["step"] + 1

    # ---- target actions with smoothing noise ------------------------------
    next_a, at_state = actor_apply(
        agent["actor_target"]["params"], agent["actor_target"]["state"],
        batch.next_states, cfg=cfg, training=True)
    noise = jnp.clip(
        cfg.policy_noise * jax.random.normal(key, next_a.shape),
        -cfg.noise_clip, cfg.noise_clip)
    next_a = jnp.clip(next_a + noise, -1.0, 1.0)

    q1t, c1t_state = critic_apply(
        agent["critic1_target"]["params"], agent["critic1_target"]["state"],
        batch.next_states, next_a, training=True)
    q2t, c2t_state = critic_apply(
        agent["critic2_target"]["params"], agent["critic2_target"]["state"],
        batch.next_states, next_a, training=True)
    target_q = batch.rewards + (1.0 - batch.dones) * cfg.gamma * jnp.minimum(q1t, q2t)
    target_q = jax.lax.stop_gradient(target_q)

    # ---- twin critic updates ---------------------------------------------
    def critic_loss_fn(params, state):
        q, new_state = critic_apply(params, state, batch.states,
                                    batch.actions, training=True)
        return jnp.mean(jnp.square(q - target_q)), new_state

    (c1_loss, c1_state), g1 = jax.value_and_grad(critic_loss_fn, has_aux=True)(
        agent["critic1"]["params"], agent["critic1"]["state"])
    upd1, opt_c1_state = opt_c1.update(g1, agent["opt"]["critic1"],
                                       agent["critic1"]["params"])
    c1_params = optax.apply_updates(agent["critic1"]["params"], upd1)

    (c2_loss, c2_state), g2 = jax.value_and_grad(critic_loss_fn, has_aux=True)(
        agent["critic2"]["params"], agent["critic2"]["state"])
    upd2, opt_c2_state = opt_c2.update(g2, agent["opt"]["critic2"],
                                       agent["critic2"]["params"])
    c2_params = optax.apply_updates(agent["critic2"]["params"], upd2)

    critic_loss = (c1_loss + c2_loss) / 2.0

    # ---- delayed actor + soft target update ------------------------------
    # targets after their train-mode forwards (running stats advanced)
    targets_in = {
        "actor_target": {"params": agent["actor_target"]["params"],
                         "state": at_state},
        "critic1_target": {"params": agent["critic1_target"]["params"],
                           "state": c1t_state},
        "critic2_target": {"params": agent["critic2_target"]["params"],
                           "state": c2t_state},
    }

    def soft(target_params, online_params):
        return jax.tree.map(
            lambda tp, pp: cfg.tau * pp + (1.0 - cfg.tau) * tp,
            target_params, online_params)

    def do_actor_update(_):
        def actor_loss_fn(a_params, a_state):
            act, new_a_state = actor_apply(a_params, a_state, batch.states,
                                           cfg=cfg, training=True)
            q, new_c1_state = critic_apply(c1_params, c1_state,
                                           batch.states, act, training=True)
            return -jnp.mean(q), (new_a_state, new_c1_state)

        (a_loss, (a_state, c1_state2)), ga = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(
                agent["actor"]["params"], agent["actor"]["state"])
        upd, new_opt = opt_a.update(ga, agent["opt"]["actor"],
                                    agent["actor"]["params"])
        ramp = _actor_ramp_factor(step, cfg)
        upd = jax.tree.map(lambda u: u * ramp, upd)
        a_params = optax.apply_updates(agent["actor"]["params"], upd)
        new_targets = {
            "actor_target": {
                "params": soft(targets_in["actor_target"]["params"], a_params),
                "state": targets_in["actor_target"]["state"]},
            "critic1_target": {
                "params": soft(targets_in["critic1_target"]["params"], c1_params),
                "state": targets_in["critic1_target"]["state"]},
            "critic2_target": {
                "params": soft(targets_in["critic2_target"]["params"], c2_params),
                "state": targets_in["critic2_target"]["state"]},
        }
        return ({"params": a_params, "state": a_state}, new_opt,
                c1_state2, new_targets, a_loss)

    def skip_actor_update(_):
        return (agent["actor"], agent["opt"]["actor"], c1_state,
                targets_in, jnp.zeros((), jnp.float32))

    (actor_out, opt_a_state, c1_state_final, targets_out,
     actor_loss) = jax.lax.cond(
         jnp.logical_and(step % cfg.policy_delay == 0,
                         step > cfg.actor_warmup),
         do_actor_update, skip_actor_update, None)

    new_agent = {
        "actor": actor_out,
        "critic1": {"params": c1_params, "state": c1_state_final},
        "critic2": {"params": c2_params, "state": c2_state},
        "actor_target": targets_out["actor_target"],
        "critic1_target": targets_out["critic1_target"],
        "critic2_target": targets_out["critic2_target"],
        "opt": {"actor": opt_a_state, "critic1": opt_c1_state,
                "critic2": opt_c2_state},
        "step": step,
    }
    metrics = {"critic_loss": critic_loss, "actor_loss": actor_loss}
    return new_agent, metrics
