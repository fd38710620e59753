#!/usr/bin/env python
"""Reconcile the AE-train-step bench (round 5, VERDICT #4/weak-4).

BENCH_r04.json (cold fresh-VM driver run) read f32 4,791 clouds/s while
the round-3 grouped-BN probe read 5,366 (docs/PERF.md). This re-measures
f32 / bf16 / bf16_selective at B=1024 on a WARM chip with the PERF.md
reject-#8 protocol: interleaved rounds (policy order re-visited per round
so drift hits all policies equally) and per-policy medians across rounds.

Usage: python benchmarks/trainstep_reconcile.py [--batch 1024]
                                                [--rounds 7] [--iters 10]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from gan_rl_3d_tpu.config import Config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.train import steps

    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    bsz = args.batch
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (bsz, 2048, 3)),
             "pad": jnp.zeros((bsz,))}
    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    params, state = model["ae"]["params"], model["ae"]["state"]

    # the shipped default: bn_stats="single_read_grouped"
    policies = {
        "f32": dict(compute_dtype=None, selective=False),
        "bf16": dict(compute_dtype=jnp.bfloat16, selective=False),
        "bf16_selective": dict(compute_dtype=jnp.bfloat16, selective=True),
    }
    run_state = {}
    for name, kw in policies.items():
        o = opt.init(params)
        p, s, o, m = steps.ae_train_step(
            params, state, o, batch, key, optimizer=opt,
            bn_stats="single_read_grouped", **kw)
        float(jnp.sum(m["loss"]))  # compile + sync (block_until_ready lies)
        run_state[name] = (p, s, o)

    times = {name: [] for name in policies}
    for r in range(args.rounds):
        for name, kw in policies.items():
            p, s, o = run_state[name]
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, s, o, m = steps.ae_train_step(
                    p, s, o, batch, jax.random.fold_in(key, r * 1000 + i),
                    optimizer=opt, bn_stats="single_read_grouped", **kw)
            float(jnp.sum(m["loss"]))  # host fetch = true sync
            dt = (time.perf_counter() - t0) / args.iters
            run_state[name] = (p, s, o)
            times[name].append(dt)
            print(f"  round {r + 1}/{args.rounds} {name:15s} "
                  f"{dt * 1e3:7.2f} ms")

    print(f"\nmedians over {args.rounds} interleaved rounds, B={bsz}:")
    for name, ts in times.items():
        med = statistics.median(ts)
        spread = (max(ts) - min(ts)) / med * 100
        print(f"  {name:15s} {med * 1e3:7.2f} ms -> {bsz / med:8,.0f} "
              f"clouds/s  (spread {spread:.1f}%)")


if __name__ == "__main__":
    main()
