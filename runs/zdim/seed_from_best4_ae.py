#!/usr/bin/env python
"""Seed a z_dim-ablation run from best4's trained autoencoder.

The AE is z-independent, so the z_dim study (does a richer latent-GAN
action space fix the flagship-scale RL degeneracy found in
runs/best4/RESULTS.md?) reuses best4's phase-1 artifact and its cached
GFVs (runs/best4/shapenet/gfv/gfvs_train.npz): copy best4's
``autoencoder_best`` AE subtree into a freshly-initialised z_dim=8 model
and save it at phase "lgan" so ``--resume seed_ae --phase full`` starts
at phase 2.  Run from runs/zdim/:  python seed_from_best4_ae.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")  # pure host-side pytree surgery

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.utils import checkpoint as ckpt_lib


def main():
    cfg1 = load_config("/root/repo/runs/best4/config_best4.yaml")
    m1 = net.init_model(jax.random.PRNGKey(cfg1.training.seed), cfg1)
    target = {"model": m1,
              "meta": {"epoch": np.int32(0), "phase_idx": np.int32(0)}}
    tree = ckpt_lib.load_checkpoint(
        "/root/repo/runs/best4/checkpoints/autoencoder_best", target)

    cfg8 = load_config("config_z8.yaml")
    m8 = net.init_model(jax.random.PRNGKey(cfg8.training.seed), cfg8)
    m8["ae"] = tree["model"]["ae"]
    ckpt_lib.save_checkpoint(
        "checkpoints/seed_ae",
        {"model": m8,
         "meta": {"epoch": tree["meta"]["epoch"],
                  "phase_idx": np.int32(net.PHASES.index("lgan"))}})
    print("seeded checkpoints/seed_ae (phase lgan) with best4's AE; "
          f"lgan z_dim={cfg8.model.lgan.z_dim}, "
          f"agent action_dim={cfg8.model.rl_agent.action_dim}")


if __name__ == "__main__":
    main()
