#!/usr/bin/env python
"""Diagnostic: sweep the z action space and measure the TRUE per-sample
completion chamfer of decode(G(z)) on a fixed eval batch.

Because the reference architecture's latent GAN takes a 1-d z
(reference configs/config.yaml:47 z_dim: 1), the GAN path's outputs form a
one-parameter family of shapes; the TD3 agent's whole job is picking the
best point on that curve per input. This sweep exposes:

* the best achievable GAN-path chamfer (per-sample oracle over z),
* how much of that the trained agent captures,
* how z* varies across inputs (if it barely varies, a constant z —
  zero-z ablation — is near-optimal and the agent has little headroom).

For action_dim == 1 the candidate set is a uniform grid (--num-z points);
for action_dim > 1 (the beyond-parity z_dim ablation, runs/zdim) a grid is
infeasible, so the oracle is taken over --num-z uniform-random candidates
in [-bound, bound]^d plus the zero vector, and the z-alignment statistic
becomes the mean cosine similarity between the agent's z and z*.

Usage: python benchmarks/z_sweep.py --config <cfg> --checkpoint <name>
           [--num-z 41] [--batch 256]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--num-z", type=int, default=41)
    parser.add_argument("--batch", type=int, default=256)
    args = parser.parse_args()

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
    from gan_rl_3d_tpu.ops import pointcloud as pc_ops
    from gan_rl_3d_tpu.train import RLGANNetTrainer

    config = load_config(args.config)
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint(args.checkpoint)
    model = trainer.model
    td3 = trainer.td3

    # Stratify the eval batch across the whole (category-ordered) test
    # split: data[:n] would be a SINGLE category (the first n files), for
    # which a near-constant z* is expected — every-kth sampling makes the
    # sweep measure cross-category per-sample signal too.
    data = trainer.test_loader.dataset.as_array()
    n = min(args.batch, len(data))
    idx = np.linspace(0, len(data) - 1, n).astype(int)
    batch = jnp.asarray(data[idx])
    complete, incomplete, mask = pc_ops.make_training_batch(
        jax.random.PRNGKey(7), batch, do_augment=False,
        spec=trainer.preproc)

    @jax.jit
    def chamfer_at_z(model, zvec):
        z = jnp.broadcast_to(zvec, (n, td3.action_dim))
        # serving GAN branch: the gan_path snapshot when phase 5 preserved
        # one (joint.preserve_gan_path), else the live stack
        out = net.gan_decode(model, net.gan_generate(model, z))
        return chamfer_ops.chamfer_distance(out, complete)

    @jax.jit
    def agent_outputs(model):
        noisy = net.encode(model, incomplete, mask)
        z_rl = net.select_z(model, noisy, td3)
        out = net.gan_decode(model, net.gan_generate(model, z_rl))
        return z_rl, chamfer_ops.chamfer_distance(out, complete)

    d = td3.action_dim
    if d == 1:
        cands = np.linspace(-td3.action_bound, td3.action_bound,
                            args.num_z)[:, None]          # (Z, 1)
        kind = f"z grid: {args.num_z} points"
        zero_iz = int(np.abs(cands[:, 0]).argmin())
    else:
        rng = np.random.default_rng(7)
        cands = rng.uniform(-td3.action_bound, td3.action_bound,
                            (args.num_z, d))
        cands[0] = 0.0                                    # zero-z candidate
        kind = f"z candidates: {args.num_z} uniform-random in {d}-d"
        zero_iz = 0
    rows = []
    for i, c in enumerate(cands):
        rows.append(np.asarray(chamfer_at_z(model, jnp.asarray(c))))
        if (i + 1) % 16 == 0 or i + 1 == len(cands):
            print(f"  swept {i + 1}/{len(cands)} candidates",
                  file=sys.stderr, flush=True)
    per_z = np.stack(rows)                                # (Z, n)
    z_rl, cd_rl = agent_outputs(model)
    z_rl = np.asarray(z_rl)                               # (n, d)
    cd_rl = np.asarray(cd_rl)

    best_iz = per_z.argmin(axis=0)                        # per-sample z*
    oracle = per_z.min(axis=0)
    best_const_iz = per_z.mean(axis=1).argmin()
    zstar = cands[best_iz]                                # (n, d)

    def fmt_z(v):
        return f"{v[0]:+.3f}" if d == 1 else (
            "[" + " ".join(f"{x:+.2f}" for x in v) + "]")

    print(f"samples: {n}; {kind} in "
          f"[-{td3.action_bound}, {td3.action_bound}]")
    print(f"per-sample oracle-z chamfer : {oracle.mean():.6f}")
    print(f"best CONSTANT z ({fmt_z(cands[best_const_iz])})   : "
          f"{per_z.mean(axis=1).min():.6f}")
    print(f"zero z                      : {per_z[zero_iz].mean():.6f}")
    print(f"agent z                     : {cd_rl.mean():.6f}")
    print(f"agent captures "
          f"{(per_z[zero_iz].mean() - cd_rl.mean()) / max(per_z[zero_iz].mean() - oracle.mean(), 1e-9) * 100:.1f}% "
          f"of the zero-z -> oracle gap")
    print(f"z* spread across samples    : mean {fmt_z(zstar.mean(axis=0))} "
          f"std {zstar.std(axis=0).mean():.3f} "
          f"(agent z: mean {fmt_z(z_rl.mean(axis=0))} "
          f"std {z_rl.std(axis=0).mean():.3f})")
    if d == 1:
        print(f"corr(agent z, z*)           : "
              f"{np.corrcoef(z_rl[:, 0], zstar[:, 0])[0, 1]:.3f}"
              if zstar.std() > 1e-6 and z_rl.std() > 1e-6 else
              "z* (or agent z) is constant — no per-sample signal to learn")
    else:
        na = np.linalg.norm(z_rl, axis=1) * np.linalg.norm(zstar, axis=1)
        ok = na > 1e-9
        cos = (z_rl * zstar).sum(axis=1)[ok] / na[ok]
        print(f"cosine(agent z, z*)         : mean {cos.mean():.3f} "
              f"(random baseline ~0)")
    trainer.close()


if __name__ == "__main__":
    main()
