#!/usr/bin/env python
"""Evaluate a trained RL-GAN-Net on the test split: configured metrics
(chamfer / hausdorff / completion ratio / f-score / EMD — all actually
implemented, unlike the reference where config.yaml:113 lists metrics that
exist nowhere), plus colored PLY exports and a static results page.

Usage: python evaluate.py --config configs/config.yaml \
           [--checkpoint joint_best] [--num-export 6]
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import pointcloud as pc_ops
from gan_rl_3d_tpu.ops.metrics import evaluate_completion
from gan_rl_3d_tpu.train import RLGANNetTrainer
from gan_rl_3d_tpu.utils import ply


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Evaluate RL-GAN-Net (TPU)")
    parser.add_argument("--config", type=str, default="configs/config.yaml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint name under training.checkpoint_dir")
    parser.add_argument("--num-export", type=int, default=6,
                        help="how many samples to export as PLY")
    parser.add_argument("--output", type=str, default="hybrid_output",
                        choices=["hybrid_output", "completed_pc",
                                 "ae_reconstruction"])
    parser.add_argument("--export-engine", type=str, default=None,
                        help="also fold the model into a deployment engine "
                             "(f32 folded — the fastest measured path) and "
                             "save it at this path")
    parser.add_argument("--export-pth", type=str, default=None,
                        help="also write the checkpoint as a reference-"
                             "loadable torch .pth pair (ae+lgan file plus "
                             "the *_rl_agent.pth sibling) at this path")
    parser.add_argument("--ablate-z", action="store_true",
                        help="also report completion chamfer for ablated "
                             "z policies (rl / zero / random / ae-only / "
                             "hybrid) — evidence the agent's z beats the "
                             "alternatives")
    parser.add_argument("--metrics", type=str, default=None,
                        help="comma-separated metric override (chamfer_"
                             "distance,hausdorff_distance,completion_ratio,"
                             "f_score,emd); default: evaluation.metrics "
                             "from the config")
    parser.add_argument("--gate-mode", type=str, default=None,
                        choices=["discriminator", "rl", "ae", "union"],
                        help="force a gate mode, overriding BOTH the "
                             "config and the calibration sidecar — the "
                             "opt-in path to 'union' per-point fusion "
                             "(2N-point output; runs/best7/RESULTS.md)")
    args = parser.parse_args()

    config = load_config(args.config)
    trainer = RLGANNetTrainer(config)
    if args.checkpoint:
        trainer.load_checkpoint(args.checkpoint)
    model = trainer.model
    td3 = trainer.td3

    # prefer the post-joint gate calibration sidecar when one exists
    from gan_rl_3d_tpu.train.gate import load_gate_calibration

    gate_mode, gate_bias = load_gate_calibration(
        config.training.checkpoint_dir,
        checkpoint=args.checkpoint,
        default_mode=config.model.gate_mode,
        default_bias=config.model.gate_bias,
        verbose=True)
    if (gate_mode, gate_bias) != (config.model.gate_mode,
                                  config.model.gate_bias):
        print(f"using calibrated gate: mode={gate_mode} bias={gate_bias:.4f}")
    if args.gate_mode is not None:
        gate_mode = args.gate_mode
        print(f"gate mode forced by --gate-mode: {gate_mode}")
    complete_fn = jax.jit(
        lambda m, x, mask: net.complete(m, x, mask, cfg=td3,
                                        gate_mode=gate_mode,
                                        gate_bias=gate_bias))

    def ablation_outputs(model, incomplete, mask, key):
        """Completion chamfer inputs for five z policies. The RL agent earns
        its keep iff 'rl' beats 'zero'/'random' and 'hybrid' beats
        'ae_only' (reference rl_agent.py:222-343 never demonstrated this —
        its phase 4 crashes as wired)."""
        noisy_gfv = net.encode(model, incomplete, mask)
        z_rl = net.select_z(model, noisy_gfv, td3)
        z_zero = jnp.zeros_like(z_rl)
        z_rand = jax.random.uniform(key, z_rl.shape, minval=-td3.action_bound,
                                    maxval=td3.action_bound)
        outs = {}
        for name, z in (("rl", z_rl), ("zero", z_zero), ("random", z_rand)):
            # serving GAN branch (the gan_path snapshot when phase 5
            # preserved one, else the live stack)
            outs[name] = net.gan_decode(model, net.gan_generate(model, z))
        outs["ae_only"] = net.decode(model, noisy_gfv)
        full = net.complete(model, incomplete, mask, cfg=td3,
                            gate_mode=gate_mode, gate_bias=gate_bias)
        outs["hybrid"] = full["hybrid_output"]
        return outs

    ablate_fn = jax.jit(ablation_outputs)

    metric_names = (tuple(m.strip() for m in args.metrics.split(","))
                    if args.metrics else tuple(config.evaluation.metrics))
    sums: dict = {}
    ablate_sums: dict = {}
    n_samples = 0
    exported = []
    key = jax.random.PRNGKey(123)

    for i, batch in enumerate(trainer.test_loader):
        k = jax.random.fold_in(key, i)
        complete_pc, incomplete, mask = pc_ops.make_training_batch(
            k, jnp.asarray(batch["complete_pc"]), do_augment=False)
        out = complete_fn(model, incomplete, mask)
        pred = out[args.output]
        metrics = evaluate_completion(
            pred, complete_pc, metric_names,
            fscore_threshold=config.evaluation.fscore_threshold,
            fscore_thresholds=config.evaluation.fscore_thresholds,
            completion_threshold=config.evaluation.completion_threshold,
            reduce=False)
        # exclude wrap-around padded duplicate rows from aggregation
        # (iterate the returned dict: f_score expands to a threshold sweep)
        keep = np.asarray(batch["pad"] == 0)
        for m, v in metrics.items():
            sums[m] = sums.get(m, 0.0) + float(np.asarray(v)[keep].sum())
        n_samples += int(keep.sum())

        if args.ablate_z:
            outs = ablate_fn(model, incomplete, mask,
                             jax.random.fold_in(k, 7))
            for name, pred_ab in outs.items():
                cd = evaluate_completion(
                    pred_ab, complete_pc, ("chamfer_distance",),
                    reduce=False)["chamfer_distance"]
                ablate_sums[name] = ablate_sums.get(name, 0.0) + float(
                    np.asarray(cd)[keep].sum())

        if i == 0 and config.evaluation.save_visualizations:
            out_dir = Path(config.training.results_dir) / "point_clouds"
            ds = trainer.test_loader.dataset
            for j in range(min(args.num_export, int(keep.sum()))):
                category = ds.files[j]["category"] if j < len(ds.files) \
                    else "unknown"
                ply.save_completion_sample(
                    str(out_dir), j + 1, category,
                    np.asarray(incomplete[j]), np.asarray(complete_pc[j]),
                    np.asarray(pred[j]),
                    incomplete_mask=np.asarray(mask[j]))
                exported.append(f"sample_{j + 1:02d}_{category}")

    stats = {m: v / max(n_samples, 1) for m, v in sums.items()}
    print("\n=== evaluation ===")
    for m, v in stats.items():
        print(f"{m}: {v:.6f}")

    if args.ablate_z:
        print("\n=== z-policy ablation (completion chamfer, lower=better) ===")
        for name in ("hybrid", "rl", "zero", "random", "ae_only"):
            if name in ablate_sums:
                print(f"{name:>8s}: {ablate_sums[name] / max(n_samples, 1):.6f}")

    html = Path(config.training.results_dir) / "results_viewer.html"
    ply.write_results_html(str(html), stats, exported)
    print(f"report: {html}")

    if args.export_engine:
        from gan_rl_3d_tpu.models import inference

        engine = inference.prepare_inference_engine(model)
        inference.save_engine(args.export_engine, engine)
        print(f"deployment engine: {args.export_engine}")
    if args.export_pth:
        from gan_rl_3d_tpu.utils.torch_convert import (
            export_reference_checkpoint)

        rl_path = export_reference_checkpoint(
            model, args.export_pth, epoch=trainer.epoch or 0, phase="joint")
        print(f"reference .pth pair: {args.export_pth} (+ {rl_path})")
    trainer.close()


if __name__ == "__main__":
    main()
