"""One-off probe: where does the fused bf16 engine lose to the f32 XLA path?

Times (on the real chip, host-fetch synced):
  - full path: f32 XLA, bf16 XLA (folded, no pallas), f32 kernel, bf16 kernel
  - encoder only: XLA f32/bf16 vs pallas kernel f32/bf16 x clouds_per_tile
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.config import Config
from gan_rl_3d_tpu.models import inference
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import encoder_kernel


def timed(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def xla_encode(folded, pc, dtype):
    """Same math as the kernel, but left to XLA (no pallas)."""
    b, n, _ = pc.shape
    x = pc.astype(dtype).reshape(b * n, 3)
    for w, bias in folded["layers"]:
        x = jnp.dot(x, w.astype(dtype),
                    preferred_element_type=jnp.float32) + bias.astype(jnp.float32)
        x = jnp.maximum(x, 0.0).astype(dtype)
    x = x.reshape(b, n, -1).astype(jnp.float32)
    pooled = jnp.max(x, axis=1)
    hw, hb = folded["head"]
    return jax.nn.relu(pooled @ hw.astype(jnp.float32) + hb.astype(jnp.float32))


def main():
    config = Config()
    td3 = config.td3_config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    bsz = 4096
    pc = jax.random.normal(jax.random.PRNGKey(1), (bsz, 2048, 3), jnp.float32)
    flop_per_cloud = 2 * 2048 * (3 * 64 + 64 * 128 + 128 * 128 + 128 * 256
                                 + 256 * 128)

    print("== full completion path ==")
    ref_fn = jax.jit(lambda m, x: net.complete(m, x, cfg=td3)["hybrid_output"])
    dt = timed(ref_fn, model, pc)
    print(f"f32 XLA complete: {dt*1e3:8.2f} ms  {bsz/dt:10,.0f} clouds/s")

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        eng = inference.prepare_inference_engine(model, dtype=dtype)
        fast = jax.jit(functools.partial(
            lambda e, x, d: inference.complete_fast(
                e, x, dtype=d)["hybrid_output"].astype(jnp.float32),
            d=dtype))
        dt = timed(fast, eng, pc)
        print(f"{name} kernel complete: {dt*1e3:8.2f} ms  "
              f"{bsz/dt:10,.0f} clouds/s")

    print("== encoder only ==")
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        folded = encoder_kernel.fold_encoder_params(
            model["ae"]["params"]["encoder"], model["ae"]["state"]["encoder"],
            dtype=dtype)
        fx = jax.jit(functools.partial(xla_encode, dtype=dtype))
        dt = timed(fx, folded, pc)
        tf = flop_per_cloud * bsz / dt / 1e12
        print(f"XLA encode {name}: {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s")
        for g in (4, 8, 16, 32):
            fk = jax.jit(functools.partial(
                encoder_kernel.encode_fused, compute_dtype=dtype))
            # rebuild with clouds_per_tile by calling fused_encoder_pool direct
            fk = jax.jit(lambda p, f, g=g, d=dtype: encoder_kernel.fused_encoder_pool(
                p, f["layers"], None, clouds_per_tile=g, compute_dtype=d))
            try:
                dt = timed(fk, pc, folded)
            except Exception as e:
                print(f"kernel {name} g={g}: FAIL {type(e).__name__}")
                continue
            tf = flop_per_cloud * bsz / dt / 1e12
            print(f"kernel {name} g={g:2d}: {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
