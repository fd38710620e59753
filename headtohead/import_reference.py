"""Checkpoint interop: run the reference's REAL trained .pth weights
through THIS framework and reproduce the reference's own eval numbers.

`eval_reference.py` scores the torch checkpoint with torch on the shared
test split; this script imports the same .pth via
`utils.torch_convert.load_reference_checkpoint`, grafts it onto the
TPU-native model, and scores it with the same protocol
(`evaluate.py`-style: 20-50% holes, no augmentation, mean bidirectional
L2 chamfer). Matching numbers (within hole-instance noise — the two
pipelines draw different random holes) prove the converter preserves the
trained function, not just random-init layer parity.

Usage (from headtohead/):
  python import_reference.py ref/checkpoints/autoencoder_best.pth --config ours/config_h2h.yaml
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="reference .pth")
    parser.add_argument("--config", default="ours/config_h2h.yaml")
    args = parser.parse_args()

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
    from gan_rl_3d_tpu.ops import pointcloud as pc_ops
    from gan_rl_3d_tpu.train.trainer import RLGANNetTrainer
    from gan_rl_3d_tpu.utils import torch_convert as tc

    config = load_config(args.config)
    bundle = tc.load_reference_checkpoint(args.checkpoint)
    print(f"imported {args.checkpoint} "
          f"(epoch {bundle['meta']['epoch']}, phase {bundle['meta']['phase']})")

    model = net.init_model(jax.random.PRNGKey(0), config)
    model["ae"] = bundle["ae"]
    model["lgan"] = bundle["lgan"]
    if "agent_networks" in bundle:
        for k, v in bundle["agent_networks"].items():
            model["agent"][k] = v

    trainer = RLGANNetTrainer(config)
    td3 = trainer.td3

    fn = jax.jit(lambda m, x, mask: net.complete(m, x, mask, cfg=td3))
    key = jax.random.PRNGKey(123)
    sums = {"hybrid": 0.0, "ae_only": 0.0}
    n = 0
    t0 = time.perf_counter()
    for i, batch in enumerate(trainer.test_loader):
        k = jax.random.fold_in(key, i)
        complete_pc, incomplete, mask = pc_ops.make_training_batch(
            k, jnp.asarray(batch["complete_pc"]), do_augment=False)
        out = fn(model, incomplete, mask)
        keep = np.asarray(batch["pad"] == 0)
        for name, pred in (("hybrid", out["hybrid_output"]),
                           ("ae_only", out["ae_reconstruction"])):
            cd = chamfer_ops.chamfer_distance(pred, complete_pc)
            sums[name] += float(np.asarray(cd)[keep].sum())
        n += int(keep.sum())
    dt = time.perf_counter() - t0

    print(f"test samples: {n}  ({dt:.1f}s, {n / dt:.1f} clouds/s inference)")
    for k_, v in sums.items():
        print(f"chamfer[{k_}]: {v / n:.6f}")
    trainer.close()


if __name__ == "__main__":
    main()
