#!/usr/bin/env python
"""Severe-corruption gate study on the best3 flagship model.

On the standard 20-50% hole distribution the calibrated gate routes
pure-AE because the AE path is per-sample dominant (oracle == AE,
gate_calibration.json). This study asks where the reference's hybrid-gate
DESIGN earns its keep: under severe corruption (50-80% of points removed)
the AE reconstruction degrades while the GAN path's learned prior does
not, so per-sample routing should beat BOTH pure paths.

Protocol: calibrate the gate threshold on the VAL split under the severe
hole spec, then evaluate hybrid/rl/ae/oracle chamfer on the TEST split
under the same spec. Run from runs/best3/:  python severe_gate.py
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import json

import jax
import numpy as np

from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.train import RLGANNetTrainer
from gan_rl_3d_tpu.train import gate as gate_lib


def main():
    config = load_config("config_best3.yaml")
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint("joint_calibrated")
    severe = dataclasses.replace(trainer.preproc, hole_min=0.5, hole_max=0.8)

    val_stats = gate_lib.gate_statistics(
        trainer.model, trainer.val_loader, trainer._put,
        jax.random.PRNGKey(2), cfg=trainer.td3, spec=severe)
    report = gate_lib.calibrate_gate(val_stats)
    print("== severe-hole (50-80%) VAL calibration ==")
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
    print(f"  raw gate (bias 0) : {raw.mean():.6f}")
    print(f"  pure rl path      : {cd_rl.mean():.6f}")
    print(f"  pure ae path      : {cd_ae.mean():.6f}")
    print(f"  per-sample oracle : {np.minimum(cd_rl, cd_ae).mean():.6f}")
    print(f"  rl-route fraction : {(margin > t).mean():.3f}")
    with open("severe_gate_results.json", "w") as f:
        json.dump({"val_calibration": report,
                   "test": {"hybrid": float(hybrid.mean()),
                            "raw_gate": float(raw.mean()),
                            "rl": float(cd_rl.mean()),
                            "ae": float(cd_ae.mean()),
                            "oracle": float(
                                np.minimum(cd_rl, cd_ae).mean()),
                            "rl_route_fraction": float(
                                (margin > t).mean())}}, f, indent=2)
    trainer.close()


if __name__ == "__main__":
    main()
