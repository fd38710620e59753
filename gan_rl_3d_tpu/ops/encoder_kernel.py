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


def _make_kernel(n_layers: int, compute_dtype, masked: bool):
    def kernel(*refs):
        # refs: x, [mask,] w1, b1, ..., wL, bL, out
        # one grid step processes `G` whole clouds: the point-MLP runs as
        # (G*N, C) matmuls (big M keeps the MXU busy; small grids keep the
        # per-step dispatch overhead negligible), then a per-cloud masked
        # max finishes while the activations are still in VMEM. When every
        # point is valid (mask=None at the call site) the mask input is
        # omitted entirely — streaming a ones-mask would add a (B, N) f32
        # HBM read plus a VPU select for nothing.
        x_ref = refs[0]    # (G, N, 3)
        base = 2 if masked else 1
        out_ref = refs[-1]  # (G, 1, C)

        g, n, _ = x_ref.shape
        x = x_ref[...].reshape(g * n, 3)
        for li in range(n_layers):
            w = refs[base + 2 * li][...]     # (C_in, C_out) compute_dtype
            b = refs[base + 2 * li + 1][...]  # (1, C_out) float32
            if li == 0 and w.shape[0] == 3:
                # xyz -> C_1 as three broadcast FMAs on the VPU: an MXU
                # matmul would bill this K=3 contraction at the K=128 tile
                # granularity, wasting ~98% of the issue slots — the VPU
                # does the 3-term contraction at full rate.
                xf = x.astype(jnp.float32)
                wf = w.astype(jnp.float32)
                y = (xf[:, 0:1] * wf[0:1, :] + xf[:, 1:2] * wf[1:2, :]
                     + xf[:, 2:3] * wf[2:3, :]) + b
            else:
                # f32 accumulation on the MXU regardless of input dtype
                y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            x = jnp.maximum(y, 0.0).astype(compute_dtype)
        c = x.shape[-1]
        x = x.reshape(g, n, c)
        if masked:
            # mask out padded points with -inf so they never win the pool
            mask_ref = refs[1]  # (G, 1, N)
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
    masked = mask is not None
    pc = pc.astype(compute_dtype)

    n_layers = len(folded_layers)
    c_out = folded_layers[-1][0].shape[1]
    grid = (bsz // g,)

    in_specs = [
        pl.BlockSpec((g, n, 3), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    data_args = [pc]
    if masked:
        mask = mask.astype(jnp.float32).reshape(bsz, 1, n)
        in_specs.append(pl.BlockSpec((g, 1, n), lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        data_args.append(mask)
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
        _make_kernel(n_layers, compute_dtype, masked),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, 1, c_out), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c_out), compute_dtype),
        interpret=interpret,
    )(*data_args, *weight_args)
    return pooled[:, 0, :].astype(jnp.float32)


def _make_int8_kernel(n_qlayers: int, masked: bool):
    def kernel(*refs):
        # refs: x, [mask,] w0, b0, (wq, dequant, b, inv_sx) x n_qlayers, out
        # the whole quantized chain runs per (G clouds)-tile in VMEM: the
        # f32 carry never goes to HBM between layers, and the quantize /
        # int8-matmul / dequant sequence is fused with the running max.
        x_ref = refs[0]
        base = 2 if masked else 1
        out_ref = refs[-1]

        g, n, _ = x_ref.shape
        x = x_ref[...].reshape(g * n, 3).astype(jnp.float32)
        w0 = refs[base][...]       # (3, C0) f32
        b0 = refs[base + 1][...]   # (1, C0) f32
        # K=3 contraction on the VPU (see _make_kernel)
        y = (x[:, 0:1] * w0[0:1, :] + x[:, 1:2] * w0[1:2, :]
             + x[:, 2:3] * w0[2:3, :]) + b0
        y = jnp.maximum(y, 0.0)
        for li in range(n_qlayers):
            off = base + 2 + 3 * li
            wq = refs[off][...]        # (K, C) int8
            s_w = refs[off + 1][...]   # (1, C) f32
            b = refs[off + 2][...]     # (1, C) f32
            # dynamic per-row activation scale (VPU row-max)
            s_x = jnp.maximum(jnp.max(jnp.abs(y), axis=1, keepdims=True),
                              1e-12) / 127.0
            xq = jnp.clip(jnp.round(y / s_x), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * s_x * s_w + b, 0.0)
        c = y.shape[-1]
        y = y.reshape(g, n, c)
        if masked:
            mask_ref = refs[1]
            y = jnp.where(mask_ref[...].reshape(g, n, 1) > 0, y, -jnp.inf)
        out_ref[...] = jnp.max(y, axis=1, keepdims=True)

    return kernel


def fused_encoder_pool_int8(
    pc: Array,
    qenc: dict,
    mask: Optional[Array] = None,
    *,
    clouds_per_tile: int = 2,
    interpret: Optional[bool] = None,
) -> Array:
    """Quantized-chain variant of fused_encoder_pool: layer 0 on the VPU,
    layers 1..L as int8 MXU matmuls (ops.quantize bundles), masked max-pool
    — all in one VMEM-resident pass. Returns (B, C_last) f32.

    Default tile is 2 clouds: the quantized chain carries more live
    temporaries per point than the plain kernel (f32 carry + int8 copy +
    i32 accumulator + per-row scales), and at 4 clouds/tile the scoped
    VMEM allocation exceeds the 16 MB limit on v5e (measured: 17.35 MB)."""
    bsz, n, _ = pc.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = clouds_per_tile
    while bsz % g != 0:
        g //= 2
    masked = mask is not None

    in_specs = [pl.BlockSpec((g, n, 3), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]
    data_args = [pc.astype(jnp.float32)]
    if masked:
        mask = mask.astype(jnp.float32).reshape(bsz, 1, n)
        in_specs.append(pl.BlockSpec((g, 1, n), lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        data_args.append(mask)

    w0, b0 = qenc["layer0"]
    weight_args = [w0, b0.reshape(1, -1)]
    for arr in weight_args:
        in_specs.append(pl.BlockSpec(arr.shape, lambda bi: (0, 0),
                                     memory_space=pltpu.VMEM))
    for wq, s_w, b in qenc["layers_q"]:
        for arr in (wq, s_w.reshape(1, -1), b.reshape(1, -1)):
            in_specs.append(pl.BlockSpec(arr.shape, lambda bi: (0, 0),
                                         memory_space=pltpu.VMEM))
            weight_args.append(arr)

    c_out = qenc["layers_q"][-1][0].shape[1]
    pooled = pl.pallas_call(
        _make_int8_kernel(len(qenc["layers_q"]), masked),
        grid=(bsz // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, 1, c_out), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
        interpret=interpret,
    )(*data_args, *weight_args)
    return pooled[:, 0, :]


def folded_encoder_pool_xla(
    pc: Array,
    folded_layers: List[Tuple[Array, Array]],
    mask: Optional[Array] = None,
    *,
    compute_dtype=jnp.float32,
) -> Array:
    """XLA (non-Pallas) twin of fused_encoder_pool: the same BN-folded
    point-MLP chain + masked max-pool, left to the XLA scheduler.

    Measured on the target chip, XLA's f32 schedule of this chain slightly
    beats the Pallas kernel (better MXU/VPU overlap across layers); the
    kernel remains the bf16 option and the proof-of-concept for VMEM
    residency. The K=3 first layer still runs as VPU FMAs. The chain stays
    in (B, N, C) layout throughout — flattening to (B*N, C) forces a
    relayout that costs more than the whole first layer."""
    x = pc.astype(compute_dtype)
    for i, (w, b) in enumerate(folded_layers):
        w = w.astype(compute_dtype)
        b = b.astype(jnp.float32)
        if i == 0 and w.shape[0] == 3:
            xf = x.astype(jnp.float32)
            wf = w.astype(jnp.float32)
            y = (xf[..., 0:1] * wf[0:1, :] + xf[..., 1:2] * wf[1:2, :]
                 + xf[..., 2:3] * wf[2:3, :]) + b
        else:
            y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        x = jnp.maximum(y, 0.0).astype(compute_dtype)
    x = x.astype(jnp.float32)
    if mask is not None:
        x = jnp.where(mask[..., None] > 0, x, -jnp.inf)
    return jnp.max(x, axis=-2)


def encode_fused(
    pc: Array,
    folded: dict,
    mask: Optional[Array] = None,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> Array:
    """Full fused inference encoder: kernel pool + head -> GFV (B, 128).

    Matches models.autoencoder.encoder_apply(training=False) to ~1e-4 in
    f32 (BN folding reassociates the affine) — see tests/test_fused_encoder.
    ``use_kernel=False`` routes the chain through the XLA twin instead of
    the Pallas kernel."""
    if use_kernel:
        pooled = fused_encoder_pool(pc, folded["layers"], mask,
                                    compute_dtype=compute_dtype)
    else:
        pooled = folded_encoder_pool_xla(pc, folded["layers"], mask,
                                         compute_dtype=compute_dtype)
    hw, hb = folded["head"]
    return jax.nn.relu(pooled @ hw.astype(jnp.float32)
                       + hb.astype(jnp.float32))
