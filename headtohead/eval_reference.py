"""Evaluate the CPU-trained reference (torch) on the shared test split.

Mirrors /root/repo/evaluate.py's protocol: for each test batch, take the
dataset's incomplete cloud (20-50% holes, random/sphere 50/50, unit-sphere
normalized, no augmentation), run the model in inference mode, and report
the mean bidirectional chamfer distance ((d_ab + d_ba)/2, true L2) of the
hybrid output and of the plain AE reconstruction against the complete cloud.

Usage: python eval_reference.py <checkpoint.pth> [--config ref/config_h2h.yaml]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--config", default="ref/config_h2h.yaml")
    args = parser.parse_args()

    torch.manual_seed(123)
    np.random.seed(123)

    from models.rl_gan_net import RLGANNet
    from utils.dataset import create_dataloader
    from utils.losses import chamfer_distance

    config = yaml.safe_load(open(args.config))

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

    config = conv(config)
    config["training"]["device"] = "cpu"

    model = RLGANNet(config)
    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    model.autoencoder.load_state_dict(ckpt["autoencoder_state_dict"])
    if "latent_gan_state_dict" in ckpt:
        model.latent_gan.load_state_dict(ckpt["latent_gan_state_dict"])
    model.eval()

    loader = create_dataloader(config["data"]["data_dir"], split="test",
                               batch_size=16, num_workers=0)

    sums = {"hybrid": 0.0, "ae_only": 0.0}
    n = 0
    t0 = time.perf_counter()
    with torch.no_grad():
        for batch in loader:
            incomplete = batch["incomplete_pc"]
            complete = batch["complete_pc"]
            out = model(incomplete, mode="inference")
            hybrid = out.get("hybrid_output", out.get("completed_pc"))
            sums["hybrid"] += float(
                chamfer_distance(hybrid, complete).sum())
            sums["ae_only"] += float(
                chamfer_distance(out["ae_reconstruction"], complete).sum())
            n += complete.shape[0]
    dt = time.perf_counter() - t0

    print(f"test samples: {n}  ({dt:.1f}s, {n / dt:.1f} clouds/s inference)")
    for k, v in sums.items():
        print(f"chamfer[{k}]: {v / n:.6f}")


if __name__ == "__main__":
    main()
