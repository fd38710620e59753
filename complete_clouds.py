#!/usr/bin/env python
"""Complete point clouds from files — the user-facing serving path.

Reads .txt/.pts/.ply/.h5 clouds, runs the full jitted completion pipeline
(encoder -> agent -> generator -> decoder + hybrid gate) from either a
training checkpoint or an exported deployment engine, and writes colored
PLY results **in the input's original coordinate frame** (the unit-sphere
normalisation applied for the model is inverted on output).

Inputs are processed in fixed-size chunks (one compiled shape, bounded
device memory), so arbitrarily large globs work.

Examples:
  python complete_clouds.py --checkpoint joint_best cloud1.ply cloud2.txt
  python complete_clouds.py --engine engine.pkl --output-dir out/ *.txt
"""

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description="Complete point clouds")
    parser.add_argument("inputs", nargs="+", help="point-cloud files")
    parser.add_argument("--config", type=str, default="configs/config.yaml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint name under training.checkpoint_dir")
    parser.add_argument("--engine", type=str, default=None,
                        help="exported deployment engine (.pkl) — used "
                             "instead of a checkpoint when given")
    parser.add_argument("--output-dir", type=str, default="./completed")
    parser.add_argument("--output", type=str, default="hybrid_output",
                        choices=["hybrid_output", "completed_pc",
                                 "ae_reconstruction"])
    parser.add_argument("--batch-size", type=int, default=64,
                        help="fixed chunk size (one compiled shape)")
    args = parser.parse_args()

    if not args.checkpoint and not args.engine:
        parser.error("pass --checkpoint or --engine: serving a randomly "
                     "initialized model would silently produce garbage")

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.data.dataset import load_point_cloud, resample_with_mask
    from gan_rl_3d_tpu.utils import ply

    config = load_config(args.config)
    n_points = config.model.autoencoder.num_points

    # load + resample; remember each cloud's centroid/scale so results map
    # back to the input coordinate frame
    rng = np.random.RandomState(0)
    clouds, masks, names, frames = [], [], [], []
    for path in args.inputs:
        try:
            raw = load_point_cloud(path)
        except (IOError, ValueError) as e:
            parser.error(f"{path}: cannot load ({e})")
        if len(raw) == 0:
            parser.error(f"{path}: no points parsed")
        pc, mask = resample_with_mask(raw, n_points, rng)
        valid = pc[mask > 0]
        centroid = valid.mean(axis=0)
        scale = float(np.linalg.norm(valid - centroid, axis=1).max()) or 1.0
        clouds.append((pc - centroid) / scale)
        masks.append(mask)
        names.append(Path(path).stem)
        frames.append((centroid, scale))

    if args.engine:
        from gan_rl_3d_tpu.models import inference
        weights = inference.load_engine(args.engine)
        fn = jax.jit(lambda w, pc_, m: inference.complete_fast(
            w, pc_, m,
            gate_mode=config.model.gate_mode)[args.output].astype(jnp.float32))
    else:
        from gan_rl_3d_tpu.models import rl_gan_net as net
        from gan_rl_3d_tpu.utils import checkpoint as ckpt_lib

        model = net.init_model(jax.random.PRNGKey(0), config)
        path = Path(config.training.checkpoint_dir) / args.checkpoint
        target = {"model": model,
                  "meta": {"epoch": np.int32(0), "phase_idx": np.int32(0)}}
        weights = ckpt_lib.load_checkpoint(str(path), target)["model"]
        td3 = config.td3_config()
        fn = jax.jit(lambda w, pc_, m: net.complete(
            w, pc_, m, cfg=td3, gate_mode=config.model.gate_mode)[args.output])

    # fixed-size chunks: pad the last one so every call reuses one trace
    bs = max(1, min(args.batch_size, len(clouds)))
    out_dir = Path(args.output_dir)
    t0 = time.perf_counter()
    for start in range(0, len(clouds), bs):
        chunk = clouds[start:start + bs]
        cmask = masks[start:start + bs]
        n_real = len(chunk)
        while len(chunk) < bs:
            chunk.append(chunk[-1])
            cmask.append(cmask[-1])
        result = np.asarray(fn(weights, jnp.asarray(np.stack(chunk)),
                               jnp.asarray(np.stack(cmask))))
        for j in range(n_real):
            i = start + j
            centroid, scale = frames[i]
            restored = result[j] * scale + centroid
            dest = out_dir / f"{names[i]}_completed.ply"
            ply.save_ply(str(dest), restored)
            print(f"{args.inputs[i]} -> {dest}")
    dt = time.perf_counter() - t0
    print(f"completed {len(names)} clouds in {dt:.2f}s "
          f"(includes first-call compile)")


if __name__ == "__main__":
    main()
