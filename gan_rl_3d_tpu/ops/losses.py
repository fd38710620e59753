"""Losses and the RL reward (reference utils/losses.py:13-245).

All functions are pure and jit-friendly. The WGAN-GP gradient penalty is a
first-class `jax.grad` through the interpolated discriminator input — the
double-backward the reference builds with `torch.autograd.grad(create_graph)`
(latent_gan.py:252-299) is native function composition here.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.ops.chamfer import chamfer_distance

Array = jax.Array
PRNGKey = jax.Array


# ---------------------------------------------------------------------------
# Reconstruction losses
# ---------------------------------------------------------------------------


def chamfer_loss(
    pred: Array,
    target: Array,
    *,
    bidirectional: bool = True,
    pred_mask: Optional[Array] = None,
    target_mask: Optional[Array] = None,
) -> Array:
    """Scalar batch-mean Chamfer (reference ChamferLoss, losses.py:62-75)."""
    return jnp.mean(
        chamfer_distance(
            pred, target, bidirectional=bidirectional,
            a_mask=pred_mask, b_mask=target_mask,
        )
    )


def gfv_loss(pred_gfv: Array, target_gfv: Array) -> Array:
    """MSE in latent space (reference GFVLoss, losses.py:106-118)."""
    return jnp.mean(jnp.square(pred_gfv - target_gfv))


def emd_sorted_approx(a: Array, b: Array) -> Array:
    """The reference's crude sort-based EMD stand-in (losses.py:78-103):
    flatten each cloud, sort coordinates, L2 between the sorted vectors."""
    bsz = a.shape[0]
    a_s = jnp.sort(a.reshape(bsz, -1), axis=1)
    b_s = jnp.sort(b.reshape(bsz, -1), axis=1)
    return jnp.mean(jnp.linalg.norm(a_s - b_s, axis=1))


# ---------------------------------------------------------------------------
# GAN losses (reference DiscriminatorLoss/GeneratorLoss, losses.py:121-166)
# ---------------------------------------------------------------------------


def discriminator_loss(real_logits: Array, fake_logits: Array,
                       loss_type: str = "wgan-gp") -> Array:
    if loss_type == "wgan-gp":
        return jnp.mean(fake_logits) - jnp.mean(real_logits)
    if loss_type == "lsgan":
        return (jnp.mean(jnp.square(real_logits - 1.0))
                + jnp.mean(jnp.square(fake_logits))) / 2.0
    # bce with logits
    real = jnp.mean(jax.nn.softplus(-real_logits))
    fake = jnp.mean(jax.nn.softplus(fake_logits))
    return (real + fake) / 2.0


def generator_loss(fake_logits: Array, loss_type: str = "wgan-gp") -> Array:
    if loss_type == "wgan-gp":
        return -jnp.mean(fake_logits)
    if loss_type == "lsgan":
        return jnp.mean(jnp.square(fake_logits - 1.0))
    return jnp.mean(jax.nn.softplus(-fake_logits))


def gradient_penalty(
    disc_fn: Callable[[Array], Array],
    key: PRNGKey,
    real: Array,
    fake: Array,
    *,
    lambda_gp: float = 10.0,
) -> Array:
    """WGAN-GP penalty lambda * E[(||∇_x D(x̂)||₂ - 1)²] at random
    interpolates x̂ (reference GradientPenalty, latent_gan.py:252-299).

    ``disc_fn`` must map a single batch of latents to per-sample scores;
    any params/state are expected to be closed over so the outer `jax.grad`
    for the discriminator step differentiates straight through this penalty.
    """
    alpha = jax.random.uniform(key, (real.shape[0], 1), real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def scalar_disc(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_disc)(interp)
    grads = grads.reshape(grads.shape[0], -1)
    norms = jnp.linalg.norm(grads, axis=1)
    return lambda_gp * jnp.mean(jnp.square(norms - 1.0))


# ---------------------------------------------------------------------------
# RL reward (reference RewardFunction, losses.py:209-245)
# ---------------------------------------------------------------------------


def completion_reward(
    pred_pc: Array,
    target_pc: Array,
    pred_gfv: Array,
    target_gfv: Array,
    discriminator_output: Array,
    *,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
) -> Array:
    """Scalar reward = -(w_ch * CD + w_gfv * MSE + w_d * (-E[D])).

    Matches reference losses.py:223-245 exactly (note the discriminator term
    enters as minus the mean score, so a confident discriminator *increases*
    the reward through the negative outer sign).
    """
    ch = chamfer_loss(pred_pc, target_pc)
    gl = gfv_loss(pred_gfv, target_gfv)
    dl = -jnp.mean(discriminator_output)
    return -(w_chamfer * ch + w_gfv * gl + w_discriminator * dl)


def completion_reward_batched(
    pred_pc: Array,
    target_pc: Array,
    pred_gfv: Array,
    target_gfv: Array,
    discriminator_output: Array,
    *,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
) -> Array:
    """Per-sample rewards (B,) — the vmapped-environment variant that lets the
    RL phase process whole batches per step instead of the reference's
    one-sample Python episodes (train_rl_gan_net.py:388-429)."""
    ch = chamfer_distance(pred_pc, target_pc)  # (B,)
    gl = jnp.mean(jnp.square(pred_gfv - target_gfv), axis=-1)  # (B,)
    dl = -discriminator_output.reshape(-1)  # (B,)
    return -(w_chamfer * ch + w_gfv * gl + w_discriminator * dl)
