"""Export-side checkpoint interop: write THIS framework's trained weights
as a reference .pth pair, load them through the reference's own
`RLGANNet.load_checkpoint` (rl_gan_net.py:253-264 — which also consumes the
`*_rl_agent.pth` sibling via rl_agent.py:383-395), and score the AE and
hybrid paths with the reference's torch pipeline on the shared test split.

This is the reverse of import_reference.py: there the reference's trained
.pth ran under JAX; here JAX-trained weights run under torch. Matching
numbers (within hole-instance noise — the two pipelines draw different
random holes) prove `utils.torch_convert.export_reference_checkpoint`
preserves the trained function.

Usage (from headtohead/):
  python export_to_reference.py --config ../runs/best4/config_best4.yaml \
      --checkpoint joint_calibrated --limit 512
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="../runs/best4/config_best4.yaml")
    parser.add_argument("--checkpoint", default="joint_calibrated",
                        help="checkpoint name under training.checkpoint_dir")
    parser.add_argument("--out", default="ours/export_best4.pth")
    parser.add_argument("--limit", type=int, default=512,
                        help="test clouds to score (torch CPU chamfer is "
                             "O(N^2) per pair; the full 3.2k split is slow)")
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    # --- 1. load our trained checkpoint and export it ---------------------
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import yaml

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.train import RLGANNetTrainer
    from gan_rl_3d_tpu.utils import torch_convert as tc

    config = load_config(args.config)
    trainer = RLGANNetTrainer(config)
    assert trainer.load_checkpoint(args.checkpoint), \
        f"checkpoint {args.checkpoint!r} not found"
    out_path = str(Path(__file__).resolve().parent / args.out)
    rl_path = tc.export_reference_checkpoint(
        trainer.model, out_path, epoch=trainer.epoch or 0,
        phase="joint")
    print(f"exported {args.checkpoint} -> {out_path} (+ {rl_path})")

    # --- 2. the REFERENCE loads it through its own API --------------------
    sys.path.insert(0, "/root/reference")
    from models.rl_gan_net import RLGANNet
    from utils.dataset import create_dataloader
    from utils.losses import chamfer_distance

    torch.manual_seed(123)
    np.random.seed(123)

    ref_config = yaml.safe_load(open(args.config))

    def conv(v):
        # the reference trainer casts scientific-notation strings manually
        # (train_rl_gan_net.py:72-101); RLGANNet needs the same treatment
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, str):
            try:
                return float(v)
            except ValueError:
                return v
        return v

    ref_config = conv(ref_config)
    ref_config["training"]["device"] = "cpu"

    model = RLGANNet(ref_config)
    epoch, phase = model.load_checkpoint(out_path)  # also loads *_rl_agent.pth
    print(f"reference RLGANNet.load_checkpoint ok (epoch {epoch}, "
          f"phase {phase}; agent + optimizers restored)")
    model.eval()

    # --- 3. score the exported weights with the reference pipeline --------
    loader = create_dataloader(ref_config["data"]["data_dir"], split="test",
                               batch_size=args.batch, num_workers=0)
    sums = {"hybrid": 0.0, "ae_only": 0.0}
    n = 0
    t0 = time.perf_counter()
    with torch.no_grad():
        for batch in loader:
            incomplete = batch["incomplete_pc"]
            complete = batch["complete_pc"]
            out = model(incomplete, mode="inference")
            hybrid = out.get("hybrid_output", out.get("completed_pc"))
            sums["hybrid"] += float(chamfer_distance(hybrid, complete).sum())
            sums["ae_only"] += float(
                chamfer_distance(out["ae_reconstruction"], complete).sum())
            n += complete.shape[0]
            if n >= args.limit:
                break
    dt = time.perf_counter() - t0
    print(f"test samples: {n}  ({dt:.1f}s, {n / dt:.1f} clouds/s inference)")
    for k, v in sums.items():
        print(f"reference-scored chamfer[{k}]: {v / n:.6f}")


if __name__ == "__main__":
    main()
