#!/usr/bin/env python
"""Severe-corruption study on the SHIPPED flagship (z8 TPU best5 stack).

Completes the severity ladder for the promoted recipe: the mild-hole
(20-50%) regime is AE-dominant (eval_best5.log: gate picks pure-AE), and
the CPU-trained z8 stack already showed the calibrated gate beating both
pure paths at 50-80% holes (runs/zdim/severe_z8_joint.log). This runs the
identical protocol — calibrate the gate threshold on VAL under the severe
spec, evaluate hybrid/rl/ae/oracle on TEST under the same spec — on the
TPU-trained checkpoints of the exact configs/config.yaml recipe, against
either joint variant.

Protocol matches runs/best3/severe_gate.py (d=1) and runs/zdim/severe_z8.py
(z8 CPU); reference gate design: /root/reference/models/rl_gan_net.py:162-171.

Run from runs/best5/:  python severe_best5.py [config] [checkpoint]
defaults: config_best5.yaml joint_calibrated   (runs on the TPU)
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.train import RLGANNetTrainer
from gan_rl_3d_tpu.train import gate as gate_lib


def main():
    config_path = sys.argv[1] if len(sys.argv) > 1 else "config_best5.yaml"
    checkpoint = sys.argv[2] if len(sys.argv) > 2 else "joint_calibrated"
    config = load_config(config_path)
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint(checkpoint)
    print(f"config: {config_path}  checkpoint: {checkpoint}")
    severe = dataclasses.replace(trainer.preproc, hole_min=0.5, hole_max=0.8)

    val_stats = gate_lib.gate_statistics(
        trainer.model, trainer.val_loader, trainer._put,
        jax.random.PRNGKey(2), cfg=trainer.td3, spec=severe)
    report = gate_lib.calibrate_gate(val_stats)
    print("== severe-hole (50-80%) VAL calibration (flagship z8 TPU) ==")
    for k, v in report.items():
        print(f"  {k}: {v}")

    test_stats = gate_lib.gate_statistics(
        trainer.model, trainer.test_loader, trainer._put,
        jax.random.PRNGKey(9), cfg=trainer.td3, spec=severe)
    margin = test_stats["margin"]
    cd_rl, cd_ae = test_stats["cd_rl"], test_stats["cd_ae"]
    t = report["gate_bias"] if report["gate_mode"] == "discriminator" else (
        -np.inf if report["gate_mode"] == "rl" else np.inf)
    hybrid = np.where(margin > t, cd_rl, cd_ae)
    raw = np.where(margin > 0, cd_rl, cd_ae)
    print(f"\n== severe-hole (50-80%) TEST, {len(margin)} clouds ==")
    print(f"  calibrated hybrid : {hybrid.mean():.6f} "
          f"(mode={report['gate_mode']}, bias={report['gate_bias']:.4f})")
    print(f"  raw-threshold gate: {raw.mean():.6f}")
    print(f"  pure RL path      : {cd_rl.mean():.6f}")
    print(f"  pure AE path      : {cd_ae.mean():.6f}")
    print(f"  per-sample oracle : {np.minimum(cd_rl, cd_ae).mean():.6f}")
    print(f"  RL-better fraction: {(cd_rl < cd_ae).mean():.4f}")
    trainer.close()


if __name__ == "__main__":
    main()
