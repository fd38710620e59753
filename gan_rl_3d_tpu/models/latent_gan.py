"""Latent-space WGAN-GP operating on 128-d Global Feature Vectors.

Capability parity with reference models/latent_gan.py:14-249:

* Generator z(1) -> [256, 512, 512, 256] (+BN+ReLU) -> 128 + Tanh
  (LatentGenerator, latent_gan.py:14-61).
* Discriminator 128 -> [128, 256, 512, 256] -> 1, each hidden block
  SpectralNorm(Dense) + LayerNorm + LeakyReLU(0.2) + Dropout(0.3), final
  SpectralNorm(Dense) (ImprovedLatentDiscriminator, latent_gan.py:154-203 —
  the variant the composite model instantiates by default, :224-225; the
  plain variant of :64-104 is available with spectral_norm=False).

Spectral-norm power-iteration vectors are explicit state and advance once
per training forward (matching torch, which iterates on every hooked
forward — including the real/fake/interpolate calls of a WGAN-GP step).
Dropout takes an explicit PRNG key.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.models.common import bn_mlp_apply, bn_mlp_init

Array = jax.Array

GENERATOR_DIMS = (256, 512, 512, 256, 128)
DISCRIMINATOR_DIMS = (128, 256, 512, 256, 1)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def generator_init(
    key,
    z_dim: int = 1,
    latent_dim: int = 128,
    hidden_dims: Sequence[int] = GENERATOR_DIMS,
) -> Tuple[dict, dict]:
    assert hidden_dims[-1] == latent_dim, (
        f"last generator dim must equal latent_dim={latent_dim}")
    p, s = bn_mlp_init(key, z_dim, hidden_dims, final_plain=True)
    return {"mlp": p}, {"mlp": s}


def generator_apply(
    params: dict,
    state: dict,
    z: Array,
    *,
    training: bool = False,
) -> Tuple[Array, dict]:
    """z (B, z_dim) -> clean GFV (B, latent_dim) in [-1, 1]."""
    gfv, mlp_s = bn_mlp_apply(params["mlp"], state["mlp"], z,
                              training=training, final_activation=jnp.tanh)
    return gfv, {"mlp": mlp_s}


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def discriminator_init(
    key,
    latent_dim: int = 128,
    hidden_dims: Sequence[int] = DISCRIMINATOR_DIMS,
    *,
    spectral_norm: bool = True,
) -> Tuple[dict, dict]:
    params, state = [], []
    dims = list(hidden_dims)
    keys = jax.random.split(key, 2 * len(dims))
    d_in = latent_dim
    for i, d_out in enumerate(dims):
        last = i == len(dims) - 1
        layer_p = {"dense": nn.dense_init(keys[2 * i], d_in, d_out)}
        layer_s = {}
        if spectral_norm:
            layer_s["sn"] = nn.spectral_norm_init(keys[2 * i + 1], (d_in, d_out))
        if not last:
            layer_p["ln"] = nn.layernorm_init(d_out)
        params.append(layer_p)
        state.append(layer_s)
        d_in = d_out
    return {"layers": params}, {"layers": state}


def discriminator_apply(
    params: dict,
    state: dict,
    gfv: Array,
    *,
    training: bool = False,
    dropout_key: Optional[Array] = None,
    dropout_rate: float = 0.3,
    leak: float = 0.2,
) -> Tuple[Array, dict]:
    """GFV (B, latent_dim) -> realness score (B, 1). No final activation
    (WGAN critic)."""
    x = gfv
    new_state = []
    n = len(params["layers"])
    if training and dropout_key is not None:
        drop_keys = jax.random.split(dropout_key, n)
    else:
        drop_keys = [None] * n
    for i, (p, s) in enumerate(zip(params["layers"], state["layers"])):
        w = p["dense"]["w"]
        layer_s = {}
        if "sn" in s:
            w, sn_s = nn.spectral_norm_apply(w, s["sn"], training=training)
            layer_s["sn"] = sn_s
        x = x @ w + p["dense"]["b"]
        if "ln" in p:  # hidden block
            x = nn.layernorm_apply(p["ln"], x)
            x = jnp.where(x >= 0, x, leak * x)  # LeakyReLU(0.2)
            if training and drop_keys[i] is not None:
                x = nn.dropout(drop_keys[i], x, dropout_rate, training=True)
        new_state.append(layer_s)
    return x, {"layers": new_state}


# ---------------------------------------------------------------------------
# Combined wrapper (reference LatentGAN, latent_gan.py:206-249)
# ---------------------------------------------------------------------------


def lgan_init(
    key,
    z_dim: int = 1,
    latent_dim: int = 128,
    generator_dims: Sequence[int] = GENERATOR_DIMS,
    discriminator_dims: Sequence[int] = DISCRIMINATOR_DIMS,
    *,
    spectral_norm: bool = True,
) -> Tuple[dict, dict]:
    kg, kd = jax.random.split(key)
    g_p, g_s = generator_init(kg, z_dim, latent_dim, generator_dims)
    d_p, d_s = discriminator_init(kd, latent_dim, discriminator_dims,
                                  spectral_norm=spectral_norm)
    return ({"generator": g_p, "discriminator": d_p},
            {"generator": g_s, "discriminator": d_s})


def lgan_generate(params, state, z, *, training=False):
    """Returns (gfv, full lgan state with the generator part updated)."""
    gfv, g_s = generator_apply(params["generator"], state["generator"], z,
                               training=training)
    return gfv, {"generator": g_s, "discriminator": state["discriminator"]}


def lgan_discriminate(params, state, gfv, *, training=False, dropout_key=None):
    """Returns (score, full lgan state with the discriminator part updated)."""
    score, d_s = discriminator_apply(params["discriminator"],
                                     state["discriminator"], gfv,
                                     training=training,
                                     dropout_key=dropout_key)
    return score, {"generator": state["generator"], "discriminator": d_s}
