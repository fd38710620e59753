#!/usr/bin/env python
"""Complete point clouds from files — the user-facing serving path.

Reads .txt/.pts/.ply/.h5 clouds, runs the full jitted completion pipeline
(encoder -> agent -> generator -> decoder + hybrid gate) from either a
training checkpoint or an exported deployment engine, and writes colored
PLY results.

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
    args = parser.parse_args()

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.data.dataset import load_point_cloud
    from gan_rl_3d_tpu.ops.pointcloud import normalize_unit_sphere
    from gan_rl_3d_tpu.utils import ply

    config = load_config(args.config)
    n_points = config.model.autoencoder.num_points

    # load + resample + normalise inputs (fixed shapes, repeat-pad)
    rng = np.random.RandomState(0)
    clouds, masks, names = [], [], []
    for path in args.inputs:
        pc = load_point_cloud(path)
        n = len(pc)
        if n >= n_points:
            pc = pc[rng.choice(n, n_points, replace=False)]
            mask = np.ones(n_points, np.float32)
        else:
            pad = pc[rng.randint(0, n, n_points - n)]
            pc = np.concatenate([pc, pad])
            mask = np.concatenate([np.ones(n, np.float32),
                                   np.zeros(n_points - n, np.float32)])
        clouds.append(pc)
        masks.append(mask)
        names.append(Path(path).stem)
    x = jnp.asarray(np.stack(clouds))
    mask = jnp.asarray(np.stack(masks))
    x = normalize_unit_sphere(x, mask)

    if args.engine:
        from gan_rl_3d_tpu.models import inference
        engine = inference.load_engine(args.engine)
        fn = jax.jit(lambda e, pc_, m: inference.complete_fast(e, pc_, m))
        t0 = time.perf_counter()
        out = fn(engine, x, mask)
        result = np.asarray(out[args.output], np.float32)
    else:
        # serving needs no dataset/trainer: init the model skeleton and
        # restore the checkpoint directly
        from pathlib import Path as _P

        from gan_rl_3d_tpu.models import rl_gan_net as net
        from gan_rl_3d_tpu.utils import checkpoint as ckpt_lib

        model = net.init_model(jax.random.PRNGKey(0), config)
        if args.checkpoint:
            path = _P(config.training.checkpoint_dir) / args.checkpoint
            target = {"model": model,
                      "meta": {"epoch": np.int32(0),
                               "phase_idx": np.int32(0)}}
            model = ckpt_lib.load_checkpoint(str(path), target)["model"]
        td3 = config.td3_config()
        fn = jax.jit(lambda m, pc_, mk: net.complete(m, pc_, mk, cfg=td3))
        t0 = time.perf_counter()
        out = fn(model, x, mask)
        result = np.asarray(out[args.output])
    dt = time.perf_counter() - t0

    out_dir = Path(args.output_dir)
    for i, name in enumerate(names):
        dest = out_dir / f"{name}_completed.ply"
        ply.save_ply(str(dest), result[i])
        print(f"{args.inputs[i]} -> {dest}")
    print(f"completed {len(names)} clouds in {dt:.2f}s "
          f"(includes first-call compile)")


if __name__ == "__main__":
    main()
