#!/usr/bin/env python
"""Training-throughput benchmark: clouds/sec through the jitted AE train
step (forward + Chamfer + backward + Adam) and steps/sec for the WGAN-GP
and TD3 updates. Complements the end-to-end inference bench (../bench.py).

Usage: python benchmarks/train_bench.py [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def sync(x) -> None:
    leaves = jax.tree.leaves(x)
    float(jnp.sum(leaves[0].ravel()[0]))


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from gan_rl_3d_tpu.config import Config
    from gan_rl_3d_tpu.models import rl_agent as rl
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.train import replay_buffer as rb
    from gan_rl_3d_tpu.train import steps

    config = Config()
    td3 = config.td3_config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    bsz = args.batch
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (bsz, 2048, 3)),
             "pad": jnp.zeros((bsz,))}

    # --- AE step ---------------------------------------------------------
    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    p, s, o, m = steps.ae_train_step(params, state, opt_state, batch, key,
                                     optimizer=opt)
    sync(m)
    t0 = time.perf_counter()
    for i in range(args.iters):
        p, s, o, m = steps.ae_train_step(p, s, o, batch,
                                         jax.random.fold_in(key, i),
                                         optimizer=opt)
    sync(m)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"AE train step     batch {bsz}: {dt * 1e3:7.2f} ms "
          f"-> {bsz / dt:9,.0f} clouds/s")

    # --- WGAN-GP d+g step -------------------------------------------------
    lcfg = config.training.lgan
    d_opt = steps.make_gan_optimizer(lcfg.discriminator_lr, lcfg)
    g_opt = steps.make_gan_optimizer(lcfg.generator_lr, lcfg)
    lp, ls = model["lgan"]["params"], model["lgan"]["state"]
    d_state, g_state = d_opt.init(lp["discriminator"]), g_opt.init(lp["generator"])
    real = jax.random.normal(key, (bsz, 128))
    lp, ls, d_state, dm = steps.lgan_d_step(lp, ls, d_state, real, key,
                                            d_opt=d_opt)
    lp, ls, g_state, gm = steps.lgan_generator_step(lp, ls, g_state, key,
                                                    g_opt=g_opt,
                                                    batch_size=bsz)
    sync(gm)
    t0 = time.perf_counter()
    for i in range(args.iters):
        k = jax.random.fold_in(key, i)
        lp, ls, d_state, dm = steps.lgan_d_step(lp, ls, d_state, real, k,
                                                d_opt=d_opt)
        lp, ls, g_state, gm = steps.lgan_generator_step(lp, ls, g_state, k,
                                                        g_opt=g_opt,
                                                        batch_size=bsz)
    sync(gm)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"WGAN-GP d+g step  batch {bsz}: {dt * 1e3:7.2f} ms "
          f"-> {1 / dt:9,.1f} steps/s")

    # --- RL step (B envs + TD3 update) -----------------------------------
    buffer = rb.buffer_init(config.model.rl_agent.buffer_size,
                            td3.state_dim, td3.action_dim)
    ou = rl.ou_init(td3, (bsz,))
    mdl, buffer, ou, rm = steps.rl_step(model, buffer, ou, batch, key,
                                        cfg=td3, start_training_size=bsz)
    sync(rm)
    t0 = time.perf_counter()
    for i in range(args.iters):
        mdl, buffer, ou, rm = steps.rl_step(mdl, buffer, ou, batch,
                                            jax.random.fold_in(key, i),
                                            cfg=td3, start_training_size=bsz)
    sync(rm)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"RL step (env+TD3) batch {bsz}: {dt * 1e3:7.2f} ms "
          f"-> {bsz / dt:9,.0f} episodes/s")


if __name__ == "__main__":
    main()
