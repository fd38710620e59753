#!/usr/bin/env python
"""End-to-end completion throughput benchmark (the north-star metric).

Measures clouds/sec through the full jitted inference path — encoder ->
actor -> generator -> decoder -> discriminator-gated hybrid output — on
2048-point clouds, matching what the reference measured at ~25 clouds/sec
on Apple-Silicon MPS (results/results_viewer.html:40; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_CLOUDS_PER_SEC = 25.0  # reference results_viewer.html:40


def _timed(fn_chain, warm_out, iters: int) -> float:
    """Wall time per iteration with REAL device synchronisation.

    On the axon tunnel platform `block_until_ready()` returns before the
    device has actually executed (measured: apparent 40 PFLOP/s); only a
    host fetch of a value truly waits. So each timing region ends with a
    scalar fetch of a reduction over the final output.
    """
    _ = float(jnp.sum(warm_out))  # warm + sync
    t0 = time.perf_counter()
    out = fn_chain(iters)
    _ = float(jnp.sum(out))  # forces execution of the whole chain
    return (time.perf_counter() - t0) / iters


def bench_completion(batch_sizes=(4096, 8192), iters: int = 15,
                     include_engines: bool = True) -> float:
    """``include_engines=False`` (the CPU-outage fallback) times only the
    reference jit path: the folded/bf16 engines use Pallas kernels, which
    off-TPU run in interpret mode — minutes per call, not a benchmark."""
    from gan_rl_3d_tpu.config import Config
    from gan_rl_3d_tpu.models import inference
    from gan_rl_3d_tpu.models import rl_gan_net as net

    config = Config()
    td3 = config.td3_config()
    model = net.init_model(jax.random.PRNGKey(0), config)

    ref_fn = jax.jit(lambda m, x: net.complete(m, x, cfg=td3)["hybrid_output"])
    paths = [("f32 reference path", ref_fn, model)]
    if include_engines:
        # deployment engine: BN/spectral-norm folded into plain affines, the
        # K=3 first layer on the VPU, decoder/discriminator pair batched into
        # one concat pass. f32 is the fast dtype on this chip (f32~bf16 MXU).
        engine = inference.prepare_inference_engine(model)
        fast_fn = jax.jit(lambda e, x: inference.complete_fast(
            e, x)["hybrid_output"])
        engine16 = inference.prepare_inference_engine(model,
                                                      dtype=jnp.bfloat16)
        fast16_fn = jax.jit(lambda e, x: inference.complete_fast(
            e, x, dtype=jnp.bfloat16)["hybrid_output"].astype(jnp.float32))
        paths += [("f32 folded engine", fast_fn, engine),
                  ("bf16 kernel engine", fast16_fn, engine16)]

    # real-time serving latency: one cloud end to end (the reference's
    # headline claim is 0.04 s/cloud at batch 1, results_viewer.html:40)
    one = jax.random.normal(jax.random.PRNGKey(2), (1, 2048, 3), jnp.float32)

    def chain1(n):
        x = one
        for _ in range(n):
            x = ref_fn(model, x)
        return x

    lat = _timed(chain1, ref_fn(model, one), 50 if include_engines else 5)
    print(f"# batch-1 latency: {lat * 1e3:.3f} ms/cloud "
          f"(reference: ~40 ms/cloud)", flush=True)

    best = 0.0
    for name, f, arg in paths:
        for bsz in batch_sizes:
            pc = jax.random.normal(jax.random.PRNGKey(1), (bsz, 2048, 3),
                                   jnp.float32)

            def chain(n, f=f, arg=arg, pc=pc):
                # output feeds next input: the chain cannot be parallelised
                # or elided, so wall time == n real end-to-end executions
                x = pc
                for _ in range(n):
                    x = f(arg, x)
                return x

            dt = _timed(chain, f(arg, pc), iters)
            rate = bsz / dt
            print(f"# {name} batch {bsz}: {dt * 1e3:.2f} ms "
                  f"-> {rate:,.0f} clouds/s", flush=True)
            best = max(best, rate)
    return best


def bench_train_step(bsz: int = 1024, iters: int = 10,
                     compute_dtype=None, selective: bool = False) -> float:
    """Clouds/sec through the jitted AE train step (forward + Chamfer +
    backward + Adam) so training-perf regressions show up in the scored
    artifact, not just benchmarks/train_bench.py. ``compute_dtype=bf16``
    measures the mixed-precision policy (training.precision: bfloat16);
    ``selective=True`` additionally keeps the GFV-bottleneck and decoder
    head f32 (training.precision: bf16_selective — the quality-neutral
    recommended recipe, runs/bf16/RESULTS.md)."""
    from gan_rl_3d_tpu.config import Config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.train import steps

    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (bsz, 2048, 3)),
             "pad": jnp.zeros((bsz,))}
    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    p, s = model["ae"]["params"], model["ae"]["state"]
    o = opt.init(p)
    name = (("bf16_selective" if selective else "bf16")
            if compute_dtype is not None else "f32")

    bn_stats = config.training.bn_stats

    p, s, o, m = steps.ae_train_step(p, s, o, batch, key, optimizer=opt,
                                     compute_dtype=compute_dtype,
                                     selective=selective,
                                     bn_stats=bn_stats)
    _ = float(m["loss"])  # warm + sync
    # best-of-3 timed blocks: a single block is at the mercy of one bad
    # host/tunnel window (observed 6x outliers on f32 under host load —
    # PERF.md train-step reconciliation; medians/min, never one sample)
    dt = float("inf")
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, o, m = steps.ae_train_step(p, s, o, batch,
                                             jax.random.fold_in(key, b * iters + i),
                                             optimizer=opt,
                                             compute_dtype=compute_dtype,
                                             selective=selective,
                                             bn_stats=bn_stats)
        _ = float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    rate = bsz / dt
    print(f"# AE train step ({name}) batch {bsz}: {dt * 1e3:.2f} ms "
          f"-> {rate:,.0f} clouds/s", flush=True)
    return rate


def _tpu_available(timeout_s: int = 1800) -> bool:
    """Probe the axon TPU backend in a SUBPROCESS with a hard timeout.

    During a pool outage make_c_api_client blocks for ~25 min before
    failing (CLAUDE.md tunnel-wedge note) — an in-process jax.devices()
    would hang the whole bench. The timeout must be WELL past the worst
    observed grant time (cold init has exceeded 900 s): killing the
    subprocess mid-claim is itself what wedges the tunnel for every later
    client, so the timeout exists only as a last-resort bound that should
    never fire on a live-but-slow pool. Falsely routing the scored run to
    the CPU fallback — or wedging the pool — is far worse than waiting
    20 extra minutes on a truly dead one."""
    import subprocess
    import sys

    # Popen + poll so a timeout ABANDONS the child instead of killing it:
    # subprocess.run() would SIGKILL mid-claim, which is exactly what
    # wedges the axon leg for every later client (CLAUDE.md). An
    # abandoned probe either errors out on its own or, when the pool
    # recovers, gets the claim, exits, and releases it immediately.
    p = subprocess.Popen(
        [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        rc = p.poll()
        if rc is not None:
            return rc == 0
        time.sleep(2.0)
    return False  # child left running, NOT killed


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    backend = "tpu"
    if not _tpu_available():
        # Degraded mode: report a small-batch CPU measurement, clearly
        # labeled, instead of hanging the scored run on a dead tunnel.
        print("# TPU backend unavailable (pool outage?) — falling back to "
              "CPU at reduced scale; numbers NOT comparable to TPU runs",
              flush=True)
        jax.config.update("jax_platforms", "cpu")
        backend = "cpu_fallback"
    if backend == "tpu":
        rate = bench_completion()
        train_rate = bench_train_step()
        train_rate_bf16 = bench_train_step(compute_dtype=jnp.bfloat16)
        train_rate_sel = bench_train_step(compute_dtype=jnp.bfloat16,
                                          selective=True)
    else:
        rate = bench_completion(batch_sizes=(256,), iters=2,
                                include_engines=False)
        train_rate = bench_train_step(bsz=64, iters=2)
        train_rate_bf16 = train_rate_sel = None
    print(json.dumps({
        "metric": "completion_throughput",
        "value": round(rate, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(rate / BASELINE_CLOUDS_PER_SEC, 1),
        "backend": backend,
        "train_step_clouds_per_sec": round(train_rate, 1),
        "train_step_bf16_clouds_per_sec":
            round(train_rate_bf16, 1) if train_rate_bf16 else None,
        "train_step_bf16_selective_clouds_per_sec":
            round(train_rate_sel, 1) if train_rate_sel else None,
    }))


if __name__ == "__main__":
    main()
