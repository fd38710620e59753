"""Post-training int8 quantization for the deployment engine.

The completion path is MXU-bound on the encoder's point-MLP, and this chip
runs int8 matmuls at ~243 TOP/s vs ~128/~144 TFLOP/s for f32/bf16 (measured
with benchmarks/engine_probe.py's dot sweep) — int8 is the only numeric
format with real headroom at large K. The deployment engine can quantize
the encoder chain (where ~98% of the FLOPs live) and keep the small tail
(actor/generator/decoder/discriminator) in bf16.

Honest caveat, measured on the target chip: at THIS architecture's layer
widths (K <= 256, billed at the MXU's K=128 tile granularity) the int8
matmuls are too small to realise that headroom, and the dynamic-quant
VPU chain (row max / divide / round / clip per layer) adds more time than
int8 saves — the f32 folded engine is faster end-to-end (bench.py). The
path is kept for models with wider trunks, for 4x weight-memory savings
in serving, and as the int8 Pallas template; it is NOT the default.

Scheme:
* weights: per-output-channel symmetric int8, ``s_w[c] = max_k |w[k,c]|/127``
* activations: dynamic per-row (per-point) symmetric scales,
  ``s_x[r] = max_c |x[r,c]|/127`` — computed on the VPU right before each
  matmul, so no calibration pass is needed and outlier points only degrade
  their own row
* accumulation: int32 on the MXU, dequantized with the rank-1 factor
  ``s_x[r] * s_w[c]`` and rebiased in f32.

The reference has no counterpart (it ships no deployment path at all); this
is the TPU-native answer to "real-time point cloud shape completion"
(reference README.md:7) as a serving artifact.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_weight_per_channel(w: Array) -> Tuple[Array, Array]:
    """(K, C) f32 -> (int8 (K, C), f32 scale (1, C)) with symmetric
    per-output-channel scaling."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_rows(x: Array) -> Tuple[Array, Array]:
    """(R, K) f32 -> (int8 (R, K), f32 per-row scale (R, 1))."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_dense(xq: Array, s_x: Array, wq: Array, s_w: Array,
               bias: Array) -> Array:
    """int8 x int8 -> int32 on the MXU, dequantized with the rank-1
    ``s_x[r] * s_w[c]`` factor and rebiased in f32."""
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s_x * s_w + bias


def quantize_encoder(folded_layers: List[Tuple[Array, Array]]) -> dict:
    """Build the quantized encoder bundle from BN-folded (w, b) layers.

    Returns::

        {"layer0": (w f32 (3, C0), b f32 (1, C0)),   # K=3 stays f32 (VPU)
         "layers_q": [(wq int8 (K, C), s_w f32 (1, C), b f32 (1, C)), ...]}

    Activation scales are dynamic (per row at runtime), so no calibration
    batch is required and the bundle is a pure function of the weights.
    """
    w0, b0 = folded_layers[0]
    layers_q = []
    for w, bias in folded_layers[1:]:
        wq, s_w = quantize_weight_per_channel(w.astype(jnp.float32))
        layers_q.append((wq, s_w, bias.astype(jnp.float32).reshape(1, -1)))
    return {
        "layer0": (w0.astype(jnp.float32),
                   b0.astype(jnp.float32).reshape(1, -1)),
        "layers_q": layers_q,
    }


def encode_int8_xla(
    pc: Array,
    qenc: dict,
    mask: Optional[Array] = None,
) -> Array:
    """Quantized encoder point-MLP + masked max-pool, XLA-only path.

    Layer 0 (K=3) runs as three broadcast FMAs on the VPU — an MXU matmul
    would bill the 3-term contraction at the K-tile granularity. Layers 1..L
    are int8 MXU matmuls with dynamic per-row activation scales.
    """
    b, n, _ = pc.shape
    x = pc.reshape(b * n, 3).astype(jnp.float32)
    w0, b0 = qenc["layer0"]
    y = (x[:, 0:1] * w0[0:1, :] + x[:, 1:2] * w0[1:2, :]
         + x[:, 2:3] * w0[2:3, :]) + b0
    y = jax.nn.relu(y)
    for wq, s_w, bias in qenc["layers_q"]:
        xq, s_x = quantize_rows(y)
        y = jax.nn.relu(int8_dense(xq, s_x, wq, s_w, bias))
    y = y.reshape(b, n, -1)
    if mask is not None:
        y = jnp.where(mask[..., None] > 0, y, -jnp.inf)
    return jnp.max(y, axis=1)
