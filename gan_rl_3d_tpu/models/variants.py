"""Optional model variants.

Capability parity with the reference's alternate architectures
(SURVEY.md §2 row 21 — defined in the reference but not wired into its
pipeline; provided here as working, tested options):

* ``attention_encoder_*``: attention-pooled PointNet encoder
  (reference PointNetWithAttention, models/autoencoder.py:174-249) —
  per-point sigmoid attention weights replace the max-pool with a
  normalised weighted sum.
* ``adaptive_decoder_*``: variable-point-count decoder with a residual
  pointwise refinement stage (reference AdaptivePointDecoder,
  models/autoencoder.py:252-323). On TPU the output count must be static
  per jit specialisation; ``num_points`` is a static argument.

Both use the same functional conventions as the primary models and can be
swapped into the autoencoder via config (encoder="attention",
decoder="adaptive" in future wiring) or used directly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.models.common import bn_mlp_apply, bn_mlp_init

Array = jax.Array


# ---------------------------------------------------------------------------
# Attention-pooled encoder
# ---------------------------------------------------------------------------


def attention_encoder_init(
    key,
    input_dim: int = 3,
    latent_dim: int = 128,
    hidden_dims: Sequence[int] = (64, 128, 128, 256, 128),
) -> Tuple[dict, dict]:
    k_mlp, k_att1, k_att2, k_head = jax.random.split(key, 4)
    mlp_p, mlp_s = bn_mlp_init(k_mlp, input_dim, hidden_dims)
    c = hidden_dims[-1]
    att = {
        "fc1": nn.dense_init(k_att1, c, c // 4),
        "fc2": nn.dense_init(k_att2, c // 4, 1),
    }
    head_p, head_s = bn_mlp_init(k_head, c, [latent_dim])
    return ({"point_mlp": mlp_p, "attention": att, "head": head_p},
            {"point_mlp": mlp_s, "head": head_s})


def attention_encoder_apply(
    params: dict,
    state: dict,
    pc: Array,
    mask: Optional[Array] = None,
    *,
    training: bool = False,
) -> Tuple[Array, dict]:
    """pc (B, N, 3) -> GFV (B, latent_dim) via attention-weighted pooling.

    Weighted sum / sum-of-weights normalisation matches the reference
    (autoencoder.py:236-244); with a mask, padded points get zero weight —
    strictly better than the reference, which has no mask concept.
    """
    feats, mlp_s = bn_mlp_apply(params["point_mlp"], state["point_mlp"], pc,
                                training=training)
    a = jax.nn.relu(nn.dense_apply(params["attention"]["fc1"], feats))
    a = jax.nn.sigmoid(nn.dense_apply(params["attention"]["fc2"], a))  # (B,N,1)
    if mask is not None:
        a = a * mask[..., None]
    weighted = jnp.sum(feats * a, axis=-2)  # (B, C)
    denom = jnp.sum(a, axis=-2) + 1e-8
    pooled = weighted / denom
    gfv, head_s = bn_mlp_apply(params["head"], state["head"], pooled,
                               training=training)
    return gfv, {"point_mlp": mlp_s, "head": head_s}


# ---------------------------------------------------------------------------
# Adaptive decoder (variable point count + residual refinement)
# ---------------------------------------------------------------------------


def adaptive_decoder_init(
    key,
    latent_dim: int = 128,
    max_points: int = 2048,
    hidden_dims: Sequence[int] = (256, 512, 1024),
) -> Tuple[dict, dict]:
    k_feat, k_gen, k_r1, k_r2 = jax.random.split(key, 4)
    feat_p, feat_s = bn_mlp_init(k_feat, latent_dim, hidden_dims)
    gen = nn.dense_init(k_gen, hidden_dims[-1], max_points * 3)
    refine_p = {"conv1": nn.dense_init(k_r1, 3, 64),
                "conv2": nn.dense_init(k_r2, 64, 3)}
    bn_p, bn_s = nn.batchnorm_init(64)
    refine_p["bn"] = bn_p
    return ({"feature_mlp": feat_p, "gen": gen, "refine": refine_p},
            {"feature_mlp": feat_s, "refine_bn": bn_s})


def adaptive_decoder_apply(
    params: dict,
    state: dict,
    gfv: Array,
    *,
    num_points: Optional[int] = None,
    training: bool = False,
) -> Tuple[Array, dict]:
    """GFV (B, latent) -> (B, num_points, 3). ``num_points`` is static (TPU
    shapes are compile-time); defaults to max_points. Pipeline: feature MLP
    -> tanh point generator -> slice -> pointwise residual refinement
    (reference autoencoder.py:292-323)."""
    max_points = params["gen"]["w"].shape[1] // 3
    n = num_points or max_points
    assert n <= max_points, f"num_points {n} > max_points {max_points}"
    feats, feat_s = bn_mlp_apply(params["feature_mlp"], state["feature_mlp"],
                                 gfv, training=training)
    pts = jnp.tanh(nn.dense_apply(params["gen"], feats))
    pts = pts.reshape(pts.shape[0], max_points, 3)[:, :n, :]
    # residual refinement (pointwise 1x1 convs == dense over channels)
    r = nn.dense_apply(params["refine"]["conv1"], pts)
    r, bn_s = nn.batchnorm_apply(params["refine"]["bn"], state["refine_bn"],
                                 r, training=training)
    r = jax.nn.relu(r)
    r = nn.dense_apply(params["refine"]["conv2"], r)
    out = pts + r
    return out, {"feature_mlp": feat_s, "refine_bn": bn_s}
