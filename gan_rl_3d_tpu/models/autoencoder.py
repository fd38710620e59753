"""PointNet autoencoder: point clouds <-> 128-d Global Feature Vectors.

Capability parity with reference models/autoencoder.py:13-171
(PointNetEncoder / PointNetDecoder / PointCloudAutoencoder), redesigned for
TPU:

* channels-last (B, N, C) layout — the per-point shared MLP is a plain
  (B*N, C) @ (C, C') MXU matmul, no Conv1d transposes;
* the global max-pool is *mask-aware*: padded points cannot win the pool
  (the reference max-pools over padding, dataset.py:399-421 + autoencoder
  forward — a latent flaw we fix while keeping a bug-compatible unmasked
  path when mask=None);
* BatchNorm state is explicit; training/eval is a static flag.

Dims (identical to the reference for weight-level parity):
encoder point-MLP 3->[64,128,128,256,128] each +BN+ReLU, max over N,
head Linear 128->128 +BN+ReLU; decoder 128->256->256->6144 (+BN+ReLU except
last) reshaped to (B, 2048, 3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.models.common import bn_mlp_apply, bn_mlp_init

Array = jax.Array

ENCODER_DIMS = (64, 128, 128, 256, 128)
DECODER_DIMS = (256, 256, 6144)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_init(
    key,
    input_dim: int = 3,
    latent_dim: int = 128,
    hidden_dims: Sequence[int] = ENCODER_DIMS,
) -> Tuple[dict, dict]:
    k_mlp, k_head = jax.random.split(key)
    mlp_p, mlp_s = bn_mlp_init(k_mlp, input_dim, hidden_dims)
    head_p, head_s = bn_mlp_init(k_head, hidden_dims[-1], [latent_dim])
    return ({"point_mlp": mlp_p, "head": head_p},
            {"point_mlp": mlp_s, "head": head_s})


def encoder_apply(
    params: dict,
    state: dict,
    pc: Array,
    mask: Optional[Array] = None,
    *,
    training: bool = False,
) -> Tuple[Array, dict]:
    """pc (B, N, 3)[, mask (B, N)] -> GFV (B, latent_dim)."""
    feats, mlp_s = bn_mlp_apply(params["point_mlp"], state["point_mlp"], pc,
                                training=training)
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, feats.dtype)
        feats = jnp.where(mask[..., None] > 0, feats, neg)
    pooled = jnp.max(feats, axis=-2)  # (B, C) permutation-invariant
    gfv, head_s = bn_mlp_apply(params["head"], state["head"], pooled,
                               training=training)
    return gfv, {"point_mlp": mlp_s, "head": head_s}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decoder_init(
    key,
    latent_dim: int = 128,
    num_points: int = 2048,
    hidden_dims: Sequence[int] = DECODER_DIMS,
) -> Tuple[dict, dict]:
    assert hidden_dims[-1] == num_points * 3, (
        f"last decoder dim must be num_points*3={num_points * 3}, "
        f"got {hidden_dims[-1]}")
    p, s = bn_mlp_init(key, latent_dim, hidden_dims, final_plain=True)
    return {"mlp": p}, {"mlp": s}


def decoder_apply(
    params: dict,
    state: dict,
    gfv: Array,
    *,
    training: bool = False,
) -> Tuple[Array, dict]:
    """GFV (B, latent_dim) -> point cloud (B, num_points, 3)."""
    x, mlp_s = bn_mlp_apply(params["mlp"], state["mlp"], gfv,
                            training=training)
    pc = x.reshape(x.shape[0], x.shape[-1] // 3, 3)
    return pc, {"mlp": mlp_s}


# ---------------------------------------------------------------------------
# Structure-based dispatch over encoder/decoder variants
# ---------------------------------------------------------------------------
# The params pytree identifies the architecture (attention encoders carry an
# "attention" subtree; adaptive decoders carry "feature_mlp"/"refine"), so
# every downstream function — composite model, train steps, checkpoints —
# works unchanged whichever variant the config selects.


def any_encoder_apply(params: dict, state: dict, pc: Array,
                      mask: Optional[Array] = None, *,
                      training: bool = False) -> Tuple[Array, dict]:
    if "attention" in params:
        from gan_rl_3d_tpu.models import variants
        return variants.attention_encoder_apply(params, state, pc, mask,
                                                training=training)
    return encoder_apply(params, state, pc, mask, training=training)


def any_decoder_apply(params: dict, state: dict, gfv: Array, *,
                      training: bool = False) -> Tuple[Array, dict]:
    if "feature_mlp" in params:
        from gan_rl_3d_tpu.models import variants
        return variants.adaptive_decoder_apply(params, state, gfv,
                                               training=training)
    return decoder_apply(params, state, gfv, training=training)


# ---------------------------------------------------------------------------
# Autoencoder wrapper (reference PointCloudAutoencoder, autoencoder.py:132-171)
# ---------------------------------------------------------------------------


def autoencoder_init(
    key,
    input_dim: int = 3,
    latent_dim: int = 128,
    num_points: int = 2048,
    encoder_dims: Sequence[int] = ENCODER_DIMS,
    decoder_dims: Sequence[int] = DECODER_DIMS,
    encoder_type: str = "pointnet",
    decoder_type: str = "mlp",
) -> Tuple[dict, dict]:
    k_enc, k_dec = jax.random.split(key)
    if encoder_type == "attention":
        from gan_rl_3d_tpu.models import variants
        enc_p, enc_s = variants.attention_encoder_init(
            k_enc, input_dim, latent_dim, encoder_dims)
    elif encoder_type == "pointnet":
        enc_p, enc_s = encoder_init(k_enc, input_dim, latent_dim,
                                    encoder_dims)
    else:
        raise ValueError(f"unknown encoder_type {encoder_type!r}")
    if decoder_type == "adaptive":
        from gan_rl_3d_tpu.models import variants
        dec_p, dec_s = variants.adaptive_decoder_init(
            k_dec, latent_dim, num_points)
    elif decoder_type == "mlp":
        dec_p, dec_s = decoder_init(k_dec, latent_dim, num_points,
                                    decoder_dims)
    else:
        raise ValueError(f"unknown decoder_type {decoder_type!r}")
    return ({"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s})


def autoencoder_apply(
    params: dict,
    state: dict,
    pc: Array,
    mask: Optional[Array] = None,
    *,
    training: bool = False,
) -> Tuple[Tuple[Array, Array], dict]:
    """Returns ((reconstruction, gfv), new_state)."""
    gfv, enc_s = any_encoder_apply(params["encoder"], state["encoder"], pc,
                                   mask, training=training)
    recon, dec_s = any_decoder_apply(params["decoder"], state["decoder"],
                                     gfv, training=training)
    return (recon, gfv), {"encoder": enc_s, "decoder": dec_s}
