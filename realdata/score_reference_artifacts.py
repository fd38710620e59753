#!/usr/bin/env python
"""Score this framework's completions of the reference's committed real
incomplete clouds against the reference's own committed ground truths,
next to the reference's own committed reconstructions of the same files.

Inputs (read-only): /root/reference/results/point_clouds/
  sample_NN_lamp_incomplete.ply     — what both pipelines start from
  sample_NN_lamp_ground_truth.ply   — the target
  sample_NN_lamp_reconstructed.ply  — the reference's own output
Ours: /root/repo/realdata/completed_ckpt/*_incomplete_completed.ply
(produced by complete_clouds.py — run run_realdata.sh first).

This is a direct quality comparison on artifacts the reference author
shipped (their results_viewer.html claims avg chamfer 0.040494 over
these; BASELINE.md).
"""

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.data.dataset import load_point_cloud
from gan_rl_3d_tpu.ops.chamfer import chamfer_distance

REF = Path("/root/reference/results/point_clouds")
OURS = Path("/root/repo/realdata/completed_ckpt")


def main():
    cd = jax.jit(lambda a, b: chamfer_distance(a[None], b[None])[0])
    rows = []
    for gt_path in sorted(REF.glob("*_ground_truth.ply")):
        stem = gt_path.name.replace("_ground_truth.ply", "")
        ref_recon = REF / f"{stem}_reconstructed.ply"
        our_recon = OURS / f"{stem}_incomplete_completed.ply"
        if not (ref_recon.exists() and our_recon.exists()):
            print(f"{stem}: missing artifacts, skipped")
            continue
        gt = jnp.asarray(load_point_cloud(str(gt_path)))
        theirs = jnp.asarray(load_point_cloud(str(ref_recon)))
        ours = jnp.asarray(load_point_cloud(str(our_recon)))
        # pad to a common fixed shape per pair for the jitted chamfer
        n = max(gt.shape[0], theirs.shape[0], ours.shape[0])

        def padto(x):
            reps = -(-n // x.shape[0])
            return jnp.tile(x, (reps, 1))[:n]

        gt_p = padto(gt)
        cd_ref = float(cd(padto(theirs), gt_p))
        cd_ours = float(cd(padto(ours), gt_p))
        rows.append((stem, cd_ours, cd_ref))
        print(f"{stem}: ours {cd_ours:.6f}  reference's own {cd_ref:.6f}")
    if rows:
        ours_avg = np.mean([r[1] for r in rows])
        ref_avg = np.mean([r[2] for r in rows])
        print(f"\nAVG over {len(rows)} committed real clouds: "
              f"ours {ours_avg:.6f} vs reference's own {ref_avg:.6f} "
              f"(reference's published avg over these: 0.040494, "
              f"results_viewer.html:38)")


if __name__ == "__main__":
    main()
