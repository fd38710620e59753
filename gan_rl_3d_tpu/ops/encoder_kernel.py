"""Fused PointNet-encoder inference kernel (Pallas).

The encoder is the completion path's FLOP hot spot: five pointwise dense
layers over N=2048 points per cloud, then a global max-pool. Run naively,
every layer round-trips a (B, N, C) activation through HBM. This kernel
keeps the whole chain in VMEM: for each (batch row, N-tile) it applies all
five folded dense+BN+ReLU layers to a (TILE_N, C) block and max-reduces the
tile into a running (1, C) accumulator — activations never touch HBM, and
the max-pool is fused with the last matmul's output while it is still
on-chip. Weights (~107k params) stay resident in VMEM across the grid.

BatchNorm (inference mode) is folded into the dense weights beforehand:
  y = (xW + b) * g + c  ==  x(W*g) + (b*g + c),  g = scale/sqrt(var+eps).

The kernel is also mask-aware (padded points cannot win the pool) and takes
an optional compute dtype (bfloat16 doubles MXU throughput; the pool output
is promoted back to f32 before the head layer).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_rl_3d_tpu import nn

Array = jax.Array


def fold_bn(dense_params: dict, bn_params: dict, bn_state: dict,
            eps: float = 1e-5) -> Tuple[Array, Array]:
    """Fold eval-mode BatchNorm into the preceding dense layer."""
    g = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    c = bn_params["bias"] - bn_state["mean"] * g
    w = dense_params["w"] * g[None, :]
    b = dense_params["b"] * g + c
    return w, b


def fold_encoder_params(encoder_params: dict, encoder_state: dict,
                        dtype=jnp.float32) -> dict:
    """Fold all point-MLP layers + the head into plain (w, b) pairs."""
    layers = []
    for p, s in zip(encoder_params["point_mlp"], encoder_state["point_mlp"]):
        w, b = fold_bn(p["dense"], p["bn"], s["bn"])
        layers.append((w.astype(dtype), b.astype(dtype)))
    head_p = encoder_params["head"][0]
    head_s = encoder_state["head"][0]
    hw, hb = fold_bn(head_p["dense"], head_p["bn"], head_s["bn"])
    return {"layers": layers, "head": (hw, hb)}


def _make_kernel(n_layers: int, compute_dtype):
    def kernel(*refs):
        # refs: x, mask, w1, b1, ..., wL, bL, out
        # one grid step processes `G` whole clouds: the point-MLP runs as
        # (G*N, C) matmuls (big M keeps the MXU busy; small grids keep the
        # per-step dispatch overhead negligible), then a per-cloud masked
        # max finishes while the activations are still in VMEM.
        x_ref = refs[0]    # (G, N, 3)
        mask_ref = refs[1]  # (G, 1, N)
        out_ref = refs[-1]  # (G, 1, C)

        g, n, _ = x_ref.shape
        x = x_ref[...].reshape(g * n, 3)
        for li in range(n_layers):
            w = refs[2 + 2 * li][...]        # (C_in, C_out) compute_dtype
            b = refs[3 + 2 * li][...]        # (1, C_out) float32
            # f32 accumulation on the MXU regardless of input dtype
            y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            x = jnp.maximum(y, 0.0).astype(compute_dtype)
        c = x.shape[-1]
        x = x.reshape(g, n, c)
        # mask out padded points with -inf so they never win the pool
        neg = jnp.asarray(-jnp.inf, x.dtype)
        x = jnp.where(mask_ref[...].reshape(g, n, 1) > 0, x, neg)
        out_ref[...] = jnp.max(x, axis=1, keepdims=True)

    return kernel


def fused_encoder_pool(
    pc: Array,
    folded_layers: List[Tuple[Array, Array]],
    mask: Optional[Array] = None,
    *,
    clouds_per_tile: int = 4,
    compute_dtype=jnp.float32,
    interpret: Optional[bool] = None,
) -> Array:
    """pc (B, N, 3)[, mask (B, N)] -> pooled features (B, C_last) float32.

    Applies the folded point-MLP chain and the global masked max-pool in a
    single VMEM-resident kernel pass (activations never reach HBM — the
    XLA path round-trips ~22 GB of activations for a 4096x2048 batch). The
    head layer (dense 128->128 on the pooled matrix) is left to XLA — it is
    one tiny matmul.
    """
    bsz, n, _ = pc.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = clouds_per_tile
    while bsz % g != 0:
        g //= 2
    if mask is None:
        mask = jnp.ones((bsz, n), jnp.float32)
    pc = pc.astype(compute_dtype)
    mask = mask.astype(jnp.float32).reshape(bsz, 1, n)

    n_layers = len(folded_layers)
    c_out = folded_layers[-1][0].shape[1]
    grid = (bsz // g,)

    in_specs = [
        pl.BlockSpec((g, n, 3), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 1, n), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    weight_args = []
    for w, b in folded_layers:
        w = w.astype(compute_dtype)
        b = b.astype(jnp.float32).reshape(1, -1)
        in_specs.append(pl.BlockSpec(w.shape, lambda bi: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda bi: (0, 0),
                                     memory_space=pltpu.VMEM))
        weight_args.extend([w, b])

    pooled = pl.pallas_call(
        _make_kernel(n_layers, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, 1, c_out), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c_out), compute_dtype),
        interpret=interpret,
    )(pc, mask, *weight_args)
    return pooled[:, 0, :].astype(jnp.float32)


def encode_fused(
    pc: Array,
    folded: dict,
    mask: Optional[Array] = None,
    *,
    compute_dtype=jnp.float32,
) -> Array:
    """Full fused inference encoder: kernel pool + head -> GFV (B, 128).

    Matches models.autoencoder.encoder_apply(training=False) to ~1e-4 in
    f32 (BN folding reassociates the affine) — see tests/test_fused_encoder.
    """
    pooled = fused_encoder_pool(pc, folded["layers"], mask,
                                compute_dtype=compute_dtype)
    hw, hb = folded["head"]
    return jax.nn.relu(pooled @ hw.astype(jnp.float32)
                       + hb.astype(jnp.float32))
