#!/usr/bin/env python
"""Sharded-vs-single partition-invariance probe for single-read BN stats.

docs/PERF.md rejection #7 killed three single-read (one HBM pass for both
moments) BN variants on the sharded-vs-single-device trajectory
equivalence guarantee: the E[x^2]-mean^2 cancellation amplifies
partition-dependent reduction rounding, and Adam amplifies that into
O(1e-3) 3-step divergence (vs <=1e-4 tolerated).

This probe measures the candidate that shard-ALIGNS the reduction instead
of compensating it after the fact: reshape the reduced axes into G=8
fixed groups that coincide with the data-mesh shards, reduce within
groups (one fused read for both moments), then combine the (G, C)
partials in a fixed sequential Neumaier-compensated order that both the
single-device and the sharded program execute identically. If the
per-group partials are bit-identical across partitionings, the combine --
and therefore the cancellation -- sees a zero difference.

Stage 1 (forced CPU, 8 virtual devices): bit-level partial comparison +
3-step AE trajectory divergence for centered vs single_read_grouped.
Run:  JAX_PLATFORMS='' python benchmarks/bn_stats_probe.py
(the script forces CPU itself, tests/conftest.py style).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.parallel import mesh as mesh_lib
from gan_rl_3d_tpu.train import steps


# --------------------------------------------------------------------------
# Stage 0: are shard-aligned per-group partials bit-identical?
# --------------------------------------------------------------------------


def partial_bit_identity():
    G, M, C = 8, 4096, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (G, M, C), jnp.float32)

    def partials(xg):
        return jnp.sum(xg, axis=1), jnp.sum(xg * xg, axis=1)

    single = jax.jit(partials)(x)
    mesh = mesh_lib.make_mesh()
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, 3))
    sharded = jax.jit(partials)(xs)
    for name, a, b in [("sum", *map(np.asarray, (single[0], sharded[0]))),
                       ("sumsq", *map(np.asarray, (single[1], sharded[1])))]:
        n_diff = int((a != b).sum())
        max_rel = float(np.abs(a - b).max() / np.abs(a).max())
        print(f"  per-group {name}: {n_diff}/{a.size} elements differ, "
              f"max rel diff {max_rel:.3e}")


# --------------------------------------------------------------------------
# Stage 1: 3-step AE trajectory divergence per BN mode
# --------------------------------------------------------------------------

# exactly tests/test_sharding.py's model, so the divergence numbers are
# measured against the same program the guarantee's test gates
N_POINTS = 256
OVERRIDES = {
    "model": {"autoencoder": {"num_points": N_POINTS,
                              "decoder_dims": [256, 256, N_POINTS * 3]}},
}


def trajectory_divergence(mode):
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 10)
    params, state = model["ae"]["params"], model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (16, N_POINTS, 3)),
             "pad": jnp.zeros((16,))}

    def run_steps(p, s, o, b, n=3):
        losses = []
        for i in range(n):
            p, s, o, m = steps.ae_train_step(
                p, s, o, b, jax.random.fold_in(key, i), optimizer=opt,
                augment=False, bn_stats=mode)
            losses.append(float(m["loss"]))
        return p, losses

    p1, losses1 = run_steps(params, state, opt_state, batch)
    mesh = mesh_lib.make_mesh()
    p8, losses8 = run_steps(
        jax.device_put(params, mesh_lib.replicated(mesh)),
        jax.device_put(state, mesh_lib.replicated(mesh)),
        jax.device_put(opt_state, mesh_lib.replicated(mesh)),
        mesh_lib.shard_batch(mesh, batch))

    loss_rel = max(abs(a - b) / abs(a) for a, b in zip(losses1, losses8))
    param_abs = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)))
    print(f"  bn_stats={mode:20s} 3-step max loss rel diff {loss_rel:.3e}  "
          f"max param abs diff {param_abs:.3e}  "
          f"(gates: 1e-4 / 5e-3)")
    return loss_rel, param_abs


def main():
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    print("== stage 0: per-group partial bit-identity (G=8 aligned) ==")
    partial_bit_identity()
    print("== stage 1: 3-step AE trajectory divergence ==")
    for mode in ("centered", "single_read_grouped"):
        trajectory_divergence(mode)


if __name__ == "__main__":
    main()
