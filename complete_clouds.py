#!/usr/bin/env python
"""Complete point clouds from files — the user-facing serving path.

Reads .txt/.pts/.ply/.h5 clouds, runs the full jitted completion pipeline
(encoder -> agent -> generator -> decoder + hybrid gate) from either a
training checkpoint or an exported deployment engine, and writes colored
PLY results **in the input's original coordinate frame** (the unit-sphere
normalisation applied for the model is inverted on output).

Inputs are processed in fixed-size chunks (one compiled shape, bounded
device memory), so arbitrarily large globs work. ``--watch DIR`` turns
the CLI into a resident completion service: the model stays loaded and
compiled, the directory is polled for new cloud files, and each new file
is completed and written as it appears — the "real-time point cloud shape
completion" deployment story (reference README.md:7) as a running
process instead of a claim.

Examples:
  python complete_clouds.py --checkpoint joint_best cloud1.ply cloud2.txt
  python complete_clouds.py --engine engine.pkl --output-dir out/ *.txt
  python complete_clouds.py --engine engine.pkl --watch incoming/ --output-dir out/
"""

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _load_framed(path, n_points, rng):
    """Load one cloud, resample to n_points with a validity mask, normalise
    into the unit sphere; return (pc, mask, (centroid, scale)) — the frame
    restores model output to the input's coordinates."""
    from gan_rl_3d_tpu.data.dataset import load_point_cloud, resample_with_mask

    raw = load_point_cloud(path)
    if len(raw) == 0:
        raise ValueError("no points parsed")
    pc, mask = resample_with_mask(raw, n_points, rng)
    valid = pc[mask > 0]
    centroid = valid.mean(axis=0)
    scale = float(np.linalg.norm(valid - centroid, axis=1).max()) or 1.0
    return (pc - centroid) / scale, mask, (centroid, scale)


def _build_fn(args, config):
    """Return (fn, weights): one jitted (weights, clouds, masks) -> output
    closure from either an exported engine or a training checkpoint."""
    from gan_rl_3d_tpu.train.gate import load_gate_calibration

    gate_mode, gate_bias = load_gate_calibration(
        config.training.checkpoint_dir,
        # engine mode: source checkpoint unknown -> legacy always-apply
        checkpoint=None if args.engine else args.checkpoint,
        default_mode=config.model.gate_mode,
        default_bias=config.model.gate_bias,
        verbose=True)
    if args.gate_mode is not None:
        gate_mode = args.gate_mode
        print(f"gate mode forced by --gate-mode: {gate_mode}")
    if args.engine:
        from gan_rl_3d_tpu.models import inference

        weights = inference.load_engine(args.engine)
        fn = jax.jit(lambda w, pc_, m: inference.complete_fast(
            w, pc_, m, gate_mode=gate_mode,
            gate_bias=gate_bias)[args.output].astype(jnp.float32))
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
            w, pc_, m, cfg=td3, gate_mode=gate_mode,
            gate_bias=gate_bias)[args.output])
    return fn, weights


def _complete_and_write(fn, weights, items, bs, out_dir):
    """items: list of (name, pc, mask, frame). Runs fixed-shape chunks
    (last chunk padded so every call reuses one trace), writes PLYs,
    returns the written paths."""
    from gan_rl_3d_tpu.utils import ply

    written = []
    for start in range(0, len(items), bs):
        chunk = items[start:start + bs]
        n_real = len(chunk)
        clouds = [c[1] for c in chunk]
        masks = [c[2] for c in chunk]
        while len(clouds) < bs:
            clouds.append(clouds[-1])
            masks.append(masks[-1])
        result = np.asarray(fn(weights, jnp.asarray(np.stack(clouds)),
                               jnp.asarray(np.stack(masks))))
        for j in range(n_real):
            name, _, _, (centroid, scale) = chunk[j]
            restored = result[j] * scale + centroid
            dest = Path(out_dir) / f"{name}_completed.ply"
            ply.save_ply(str(dest), restored)
            written.append(dest)
    return written


_CLOUD_SUFFIXES = (".txt", ".pts", ".ply", ".h5")


def _watch(args, config, fn, weights, n_points):
    """Resident service loop: poll --watch for new cloud files, complete
    each as it appears. A file is picked up once its mtime is at least
    --settle seconds old (so half-written files are skipped) and is
    processed exactly once per (path, mtime). ``--max-files`` bounds the
    run for scripted use; default runs until interrupted."""
    watch_dir = Path(args.watch)
    rng = np.random.RandomState(0)
    seen = {}
    done = 0
    print(f"watching {watch_dir}/ for {'/'.join(_CLOUD_SUFFIXES)} "
          f"-> {args.output_dir}/ (ctrl-c to stop)", flush=True)
    while args.max_files is None or done < args.max_files:
        batch = []
        now = time.time()
        present = set()
        for p in sorted(watch_dir.iterdir()) if watch_dir.is_dir() else []:
            if p.suffix.lower() not in _CLOUD_SUFFIXES:
                continue
            present.add(p.name)
            mtime = None
            try:
                # the file can vanish between iterdir() and here; a
                # deleted entry must not kill the resident service
                mtime = p.stat().st_mtime
                if seen.get(p.name) == mtime or now - mtime < args.settle:
                    continue
                pc, mask, frame = _load_framed(str(p), n_points, rng)
            except OSError as e:
                if not p.exists():
                    continue
                print(f"{p}: skipped ({e})", flush=True)
                # remember the failing mtime (when stat succeeded) so a
                # persistently unreadable file isn't retried every poll;
                # rewriting the file (new mtime) re-triggers a pickup
                seen[p.name] = mtime if mtime is not None else now
                continue
            except ValueError as e:
                print(f"{p}: skipped ({e})", flush=True)
                seen[p.name] = mtime
                continue
            seen[p.name] = mtime
            batch.append((p.stem, pc, mask, frame))
            if args.max_files is not None and done + len(batch) >= args.max_files:
                break
        # drop bookkeeping for files deleted from the watch dir so a
        # long-running service's memory stays bounded
        for name in list(seen):
            if name not in present:
                del seen[name]
        if batch:
            t0 = time.perf_counter()
            written = _complete_and_write(fn, weights, batch,
                                          args.batch_size, args.output_dir)
            dt = time.perf_counter() - t0
            done += len(written)
            for w in written:
                print(f"-> {w}", flush=True)
            print(f"{len(written)} cloud(s) in {dt * 1e3:.1f} ms", flush=True)
        else:
            time.sleep(args.poll_interval)
    print(f"watch done: {done} cloud(s) completed", flush=True)


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description="Complete point clouds")
    parser.add_argument("inputs", nargs="*", help="point-cloud files")
    parser.add_argument("--config", type=str, default="configs/config.yaml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint name under training.checkpoint_dir")
    parser.add_argument("--engine", type=str, default=None,
                        help="exported deployment engine (.pkl) — used "
                             "instead of a checkpoint when given")
    parser.add_argument("--output-dir", type=str, default="./completed")
    parser.add_argument("--gate-mode", type=str, default=None,
                        choices=["discriminator", "rl", "ae", "union"],
                        help="force a gate mode over config + calibration "
                             "sidecar; 'union' = per-point fusion, 2N-point "
                             "output (runs/best7/RESULTS.md)")
    parser.add_argument("--output", type=str, default="hybrid_output",
                        choices=["hybrid_output", "completed_pc",
                                 "ae_reconstruction"])
    parser.add_argument("--batch-size", type=int, default=None,
                        help="fixed chunk size (one compiled shape); "
                             "default 64, or 8 in --watch mode where "
                             "first-completion latency beats throughput")
    parser.add_argument("--watch", type=str, default=None,
                        help="run as a resident service: poll this "
                             "directory and complete new files as they "
                             "appear")
    parser.add_argument("--poll-interval", type=float, default=0.25,
                        help="watch-mode poll period, seconds")
    parser.add_argument("--settle", type=float, default=0.2,
                        help="watch-mode: only pick up files whose mtime "
                             "is at least this old")
    parser.add_argument("--max-files", type=int, default=None,
                        help="watch-mode: exit after completing this many "
                             "files (default: run until interrupted)")
    args = parser.parse_args()

    if not args.checkpoint and not args.engine:
        parser.error("pass --checkpoint or --engine: serving a randomly "
                     "initialized model would silently produce garbage")
    if bool(args.inputs) == bool(args.watch):
        parser.error("pass input files OR --watch DIR")

    from gan_rl_3d_tpu.config import load_config

    config = load_config(args.config)
    n_points = config.model.autoencoder.num_points
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    fn, weights = _build_fn(args, config)

    if args.watch:
        # service latency beats throughput: default to small chunks so one
        # big drop of files doesn't stall the first completions behind a
        # huge batch — but an explicit --batch-size (e.g. a bulk backfill
        # with --max-files) is honoured as given
        args.batch_size = 8 if args.batch_size is None \
            else max(1, args.batch_size)
        _watch(args, config, fn, weights, n_points)
        return

    rng = np.random.RandomState(0)
    items = []
    for path in args.inputs:
        try:
            pc, mask, frame = _load_framed(path, n_points, rng)
        except (IOError, ValueError) as e:
            parser.error(f"{path}: cannot load ({e})")
        items.append((Path(path).stem, pc, mask, frame))

    bs = max(1, min(args.batch_size or 64, len(items)))
    t0 = time.perf_counter()
    written = _complete_and_write(fn, weights, items, bs, args.output_dir)
    for src, dest in zip(args.inputs, written):
        print(f"{src} -> {dest}")
    dt = time.perf_counter() - t0
    print(f"completed {len(items)} clouds in {dt:.2f}s "
          f"(includes first-call compile)")


if __name__ == "__main__":
    main()
