#!/usr/bin/env python
"""Severe-corruption study on the z_dim=8 stack (pre-joint, CPU-trained).

The mild-hole (20-50%) regime is AE-dominant: the z8 agent path scores
0.0322 vs the AE's 0.0234 (RESULTS.md §5). Under severe corruption
(50-80% of points removed) the AE's input collapses while the GAN
path's learned prior + per-sample z policy should hold up — the same
regime where best3's d=1 calibrated gate earned its keep
(runs/best3/severe_gate.py). Protocol mirrors that study: calibrate the
gate threshold on VAL under the severe spec, evaluate hybrid/rl/ae/
oracle on TEST under the same spec.

Run from runs/zdim/:  python severe_z8.py [checkpoint]  (forces CPU)

``checkpoint`` defaults to the pre-joint ``rl_agent_final``; pass
``joint_calibrated`` for the FAIR variant (VERDICT r3 weak #4): a D that
postdates the agent via the phase-5.5 refresh, matching the d=1 protocol
of runs/best3/severe_gate.py.
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.train import RLGANNetTrainer
from gan_rl_3d_tpu.train import gate as gate_lib


def main():
    checkpoint = sys.argv[1] if len(sys.argv) > 1 else "rl_agent_final"
    config = load_config("config_z8_cpu_rl2.yaml")
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint(checkpoint)
    print(f"checkpoint: {checkpoint}")
    severe = dataclasses.replace(trainer.preproc, hole_min=0.5, hole_max=0.8)

    val_stats = gate_lib.gate_statistics(
        trainer.model, trainer.val_loader, trainer._put,
        jax.random.PRNGKey(2), cfg=trainer.td3, spec=severe)
    report = gate_lib.calibrate_gate(val_stats)
    print("== severe-hole (50-80%) VAL calibration (z_dim=8) ==")
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
