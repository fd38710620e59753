#!/usr/bin/env python
"""Per-point fusion study: can combining the AE and GAN outputs beat the
per-sample gate?

The reference's hybrid gate is sample-binary — each cloud comes entirely
from one path (reference models/rl_gan_net.py:162-171), so the per-sample
oracle min(ae, rl) bounds it. Per-POINT fusion is outside that bound: the
two paths may cover complementary regions, so a union of their points can
improve the coverage term (GT->pred) even when one path dominates on
average. Candidates measured on the val split, winner confirmed on test:

* ``ae`` / ``rl``            — the pure paths (baselines)
* ``gate_oracle``            — per-sample min (the gate's ceiling)
* ``union4096``              — raw 4096-point union (no resample; the
                               coverage ceiling, at 2x points)
* ``union_fps``              — union resampled to 2048 via farthest-point
                               sampling (drop-in output-size parity)
* ``union_consensus``        — union resampled to 2048 keeping the points
                               CLOSEST to the other path's cloud
                               (consensus filter: mutual agreement kills
                               each path's outlier points, the precision
                               mirror of FPS's coverage bias)

Usage (from a run dir): python fusion_study.py <config> <checkpoint>
                        [--cpu] [--severe] [--batches N]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (dev/smoke)")
    ap.add_argument("--severe", action="store_true",
                    help="use the 50-80%% hole spec instead of the default")
    ap.add_argument("--batches", type=int, default=0,
                    help="cap evaluated val/test batches (0 = all)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
    from gan_rl_3d_tpu.ops import pointcloud as pc_ops
    from gan_rl_3d_tpu.train import RLGANNetTrainer

    config = load_config(args.config)
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint(args.checkpoint)
    spec = trainer.preproc
    if args.severe:
        spec = dataclasses.replace(spec, hole_min=0.5, hole_max=0.8)
    td3 = trainer.td3
    print(f"config: {args.config}  checkpoint: {args.checkpoint}  "
          f"severe: {args.severe}")

    def fps_indices(pts, k):
        """Farthest-point sampling indices (B, k) via lax.scan — O(k*N)
        per cloud, fixed shapes."""
        B, N, _ = pts.shape

        def body(carry, _):
            mind, last = carry
            lastp = jnp.take_along_axis(
                pts, last[:, None, None].astype(jnp.int32), axis=1)
            d = jnp.sum(jnp.square(pts - lastp), axis=-1)
            mind = jnp.minimum(mind, d)
            nxt = jnp.argmax(mind, axis=1)
            return (mind, nxt), nxt

        init = (jnp.full((B, N), jnp.inf), jnp.zeros((B,), jnp.int32))
        (_, _), idx = jax.lax.scan(body, init, None, length=k - 1)
        idx = jnp.concatenate([jnp.zeros((1, B), jnp.int32), idx], axis=0)
        return jnp.transpose(idx)  # (B, k)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fusion_outputs(model, batch, key, k=2048):
        complete, incomplete, mask = pc_ops.make_training_batch(
            key, batch["complete_pc"], do_augment=False, spec=spec)
        out = net.complete(model, incomplete, mask, cfg=td3, hybrid=False)
        rl_pc, ae_pc = out["completed_pc"], out["ae_reconstruction"]
        cd = lambda pred: chamfer_ops.chamfer_distance(pred, complete,
                                                       bidirectional=True)
        union = jnp.concatenate([rl_pc, ae_pc], axis=1)       # (B, 2N, 3)
        # FPS resample (coverage-preserving)
        fidx = fps_indices(union, k)
        fused_fps = jnp.take_along_axis(union, fidx[..., None], axis=1)
        # consensus resample: keep union points nearest the OTHER cloud
        d_rl_to_ae = chamfer_ops.nearest_min_distances(rl_pc, ae_pc)
        d_ae_to_rl = chamfer_ops.nearest_min_distances(ae_pc, rl_pc)
        agree = jnp.concatenate([d_rl_to_ae, d_ae_to_rl], axis=1)  # (B, 2N)
        cidx = jnp.argsort(agree, axis=1)[:, :k]
        fused_cons = jnp.take_along_axis(union, cidx[..., None], axis=1)
        # AE + gap-fill: keep the whole AE cloud and append only the GAN
        # points that are FAR from it (fill AE's coverage holes without
        # importing the GAN path's redundant/outlier mass)
        far_idx = jnp.argsort(-d_rl_to_ae, axis=1)[:, :k // 8]
        gaps = jnp.take_along_axis(rl_pc, far_idx[..., None], axis=1)
        ae_gaps = jnp.concatenate([ae_pc, gaps], axis=1)
        res = {
            "ae": cd(ae_pc),
            "rl": cd(rl_pc),
            "gate_oracle": jnp.minimum(cd(ae_pc), cd(rl_pc)),
            "union4096": cd(union),
            "union_fps": cd(fused_fps),
            "union_consensus": cd(fused_cons),
            "ae_plus_gaps": cd(ae_gaps),
        }
        # headroom diagnostic: per-sample best over every candidate — if
        # this ~equals gate_oracle, per-point fusion has nothing to add
        res["any_oracle"] = functools.reduce(jnp.minimum, res.values())
        return res, batch["pad"]

    def run_split(loader, name):
        cols = {}
        key = jax.random.PRNGKey(2 if name == "val" else 7)
        for i, batch in enumerate(loader):
            if args.batches and i >= args.batches:
                break
            m, pad = fusion_outputs(trainer.model, trainer._put(batch),
                                    jax.random.fold_in(key, i))
            keep = np.asarray(pad) == 0
            for kk, v in m.items():
                cols.setdefault(kk, []).append(np.asarray(v)[keep])
        means = {kk: float(np.concatenate(v).mean())
                 for kk, v in cols.items()}
        print(f"== {name} split ==")
        for kk in ("ae", "rl", "gate_oracle", "union4096", "union_fps",
                   "union_consensus", "ae_plus_gaps", "any_oracle"):
            print(f"  {kk:16s} {means[kk]:.6f}")
        return means

    run_split(trainer.val_loader, "val")
    run_split(trainer.test_loader, "test")


if __name__ == "__main__":
    main()
