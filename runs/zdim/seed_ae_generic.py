#!/usr/bin/env python
"""Seed a z_dim-ablation run from any trained autoencoder checkpoint.

Generalisation of seed_from_best4_ae.py (whose hard-coded best4 source
checkpoint no longer exists after the VM rotation): the AE is
z-independent, so any flagship AE seeds a z_dim study. Copies the AE
subtree of --source-ckpt (read against --source-config's model shape)
into a freshly-initialised model built from --target-config and saves it
at phase "lgan" under the target's checkpoint_dir as ``seed_ae``.

Usage (from runs/zdim/):
  python seed_ae_generic.py --source-config /root/repo/runs/best5/config_best5.yaml \
      --source-ckpt /root/repo/runs/best5/checkpoints/autoencoder_best \
      --target-config config_z16_cpu.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")  # pure host-side pytree surgery

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.utils import checkpoint as ckpt_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-config", required=True)
    ap.add_argument("--source-ckpt", required=True)
    ap.add_argument("--target-config", required=True)
    args = ap.parse_args()

    cfg_src = load_config(args.source_config)
    m_src = net.init_model(jax.random.PRNGKey(cfg_src.training.seed), cfg_src)
    target = {"model": m_src,
              "meta": {"epoch": np.int32(0), "phase_idx": np.int32(0)}}
    tree = ckpt_lib.load_checkpoint(os.path.abspath(args.source_ckpt), target)

    cfg_tgt = load_config(args.target_config)
    m_tgt = net.init_model(jax.random.PRNGKey(cfg_tgt.training.seed), cfg_tgt)
    m_tgt["ae"] = tree["model"]["ae"]
    out = os.path.join(cfg_tgt.training.checkpoint_dir, "seed_ae")
    ckpt_lib.save_checkpoint(
        out,
        {"model": m_tgt,
         "meta": {"epoch": tree["meta"]["epoch"],
                  "phase_idx": np.int32(net.PHASES.index("lgan"))}})
    print(f"seeded {out} (phase lgan) from {args.source_ckpt}; "
          f"lgan z_dim={cfg_tgt.model.lgan.z_dim}, "
          f"agent action_dim={cfg_tgt.model.rl_agent.action_dim}")


if __name__ == "__main__":
    main()
