"""A/B probe: does an optimization_barrier after preprocessing pay?

benchmarks/train_probe.py attributed a ~19 ms/step residue (B=1024 f32) to
the preprocess->grads boundary *inside* one XLA program: grads with runtime
inputs cost ~178 ms while preprocess(11 ms)+grads fused cost ~208 ms.
Hypothesis: the hole-cut sort's three outputs feed both the encoder branch
and the Chamfer branch, and XLA's fusion duplication recomputes (part of)
the sort per consumer. A `lax.optimization_barrier` after
`make_training_batch` forces one materialization.

Measures the two full-step variants INTERLEAVED (tunnel run-to-run variance
is ~10%), host-fetch synced, and prints medians.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from gan_rl_3d_tpu.config import Config
from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
from gan_rl_3d_tpu.ops import pointcloud as pc_ops
from gan_rl_3d_tpu.train import steps


def make_step(opt, barrier: bool, bn_stats: str):
    spec = pc_ops.DEFAULT_PREPROC

    def step(params, bn_state, opt_state, batch, key):
        k_data, _ = jax.random.split(key)
        complete, incomplete, mask = pc_ops.make_training_batch(
            k_data, batch["complete_pc"], do_augment=True, spec=spec)
        if barrier:
            complete, incomplete, mask = jax.lax.optimization_barrier(
                (complete, incomplete, mask))

        def loss_fn(p):
            with nn.bn_stats_mode(bn_stats):
                (recon, _gfv), new_state = ae.autoencoder_apply(
                    p, bn_state, incomplete, mask, training=True)
            per = chamfer_ops.chamfer_distance(recon, complete)
            return per.mean(), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, loss

    return jax.jit(step)


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    config = Config()
    bn_stats = config.training.bn_stats
    model = net.init_model(jax.random.PRNGKey(0), config)
    p, s = model["ae"]["params"], model["ae"]["state"]
    key = jax.random.PRNGKey(1)
    pc = jax.random.normal(key, (bsz, 2048, 3))
    batch = {"complete_pc": pc, "pad": jnp.zeros((bsz,))}
    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    o = opt.init(p)

    variants = {name: make_step(opt, barrier, bn_stats)
                for name, barrier in (("fused", False), ("barrier", True))}
    times = {name: [] for name in variants}

    # warm + compile both
    for name, fn in variants.items():
        out = fn(p, s, o, batch, key)
        _ = float(out[3])

    iters = 8
    for r in range(rounds):
        for name, fn in variants.items():
            out = fn(p, s, o, batch, key)
            _ = float(out[3])  # sync before the timed region
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(p, s, o, batch, jax.random.fold_in(key, i))
            _ = float(out[3])
            times[name].append((time.perf_counter() - t0) / iters)

    print(f"== full AE step (bn_stats={bn_stats}), B={bsz}, f32, "
          f"{rounds} interleaved rounds x {iters} iters ==", flush=True)
    for name, ts in times.items():
        ms = [t * 1e3 for t in ts]
        print(f"{name:8s}: median {statistics.median(ms):7.2f} ms  "
              f"min {min(ms):7.2f}  max {max(ms):7.2f}  "
              f"({bsz/statistics.median(ts):,.0f} clouds/s)", flush=True)


if __name__ == "__main__":
    main()
