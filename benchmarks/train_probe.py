"""One-off probe: where does the AE train step's time go?

bench.py measures the whole jitted step (~80 ms at B=256 f32); the Chamfer
kernel accounts for ~30 ms and the model matmuls for ~2 ms — this probe
times the remaining stages (preprocessing, forward, backward, optimizer)
as separate jitted programs on the real chip, host-fetch synced.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from gan_rl_3d_tpu.config import Config
from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
from gan_rl_3d_tpu.ops import pointcloud as pc_ops
from gan_rl_3d_tpu.train import steps


def timed(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    p, s = model["ae"]["params"], model["ae"]["state"]
    key = jax.random.PRNGKey(1)
    pc = jax.random.normal(key, (bsz, 2048, 3))
    batch = {"complete_pc": pc, "pad": jnp.zeros((bsz,))}
    spec = pc_ops.DEFAULT_PREPROC

    print(f"== AE train step stages, B={bsz}, f32 ==", flush=True)

    f_pre = jax.jit(lambda k, x: pc_ops.make_training_batch(
        k, x, do_augment=True, spec=spec))
    dt = timed(f_pre, key, pc)
    print(f"preprocess (holes+augment): {dt*1e3:8.2f} ms", flush=True)
    complete, incomplete, mask = f_pre(key, pc)

    f_enc = jax.jit(lambda p_, s_, x, m: ae.encoder_apply(
        p_, s_, x, m, training=True))
    dt = timed(f_enc, p["encoder"], s["encoder"], incomplete, mask)
    print(f"encoder fwd (train):        {dt*1e3:8.2f} ms", flush=True)

    f_fwd = jax.jit(lambda p_, s_, x, m: ae.autoencoder_apply(
        p_, s_, x, m, training=True)[0][0])
    dt = timed(f_fwd, p, s, incomplete, mask)
    print(f"ae fwd (train):             {dt*1e3:8.2f} ms", flush=True)

    f_cd = jax.jit(lambda a, b: chamfer_ops.chamfer_distance(a, b).mean())
    recon = f_fwd(p, s, incomplete, mask)
    dt = timed(f_cd, recon, complete)
    print(f"chamfer fwd:                {dt*1e3:8.2f} ms", flush=True)

    f_cd_g = jax.jit(jax.grad(
        lambda a, b: chamfer_ops.chamfer_distance(a, b).mean()))
    dt = timed(f_cd_g, recon, complete)
    print(f"chamfer fwd+bwd:            {dt*1e3:8.2f} ms", flush=True)

    def loss_fn(p_):
        (r, _g), ns = ae.autoencoder_apply(p_, s, incomplete, mask,
                                           training=True)
        return chamfer_ops.chamfer_distance(r, complete).mean(), ns

    f_loss = jax.jit(lambda p_: loss_fn(p_)[0])
    dt = timed(f_loss, p)
    print(f"fwd+chamfer:                {dt*1e3:8.2f} ms", flush=True)

    f_grad = jax.jit(lambda p_: jax.value_and_grad(
        loss_fn, has_aux=True)(p_)[1])
    dt = timed(f_grad, p)
    print(f"fwd+chamfer+bwd (grads):    {dt*1e3:8.2f} ms", flush=True)

    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    o = opt.init(p)

    # optimizer in isolation (attributes the "optimizer + rest" residue:
    # FULL - preprocess - grads - this = program-boundary overlap the
    # separate-program stage timings can't see)
    import optax
    grads = f_grad(p)
    f_opt = jax.jit(lambda g, o_, p_: optax.apply_updates(
        p_, opt.update(g, o_, p_)[0]))
    dt = timed(f_opt, grads, o, p)
    print(f"optimizer update+apply:     {dt*1e3:8.2f} ms", flush=True)

    # Fused boundary programs: localize the residue (FULL minus the sum of
    # the separate stages). If preprocess+grads fused ~= their separate sum,
    # the preprocess->grads boundary is free; whatever remains sits in the
    # grads program itself when its inputs are runtime tensors instead of
    # the baked-in constants the isolated f_grad closure enjoys.
    def pre_grads(p_, k, x):
        comp, inc, msk = pc_ops.make_training_batch(
            k, x, do_augment=True, spec=spec)

        def lf(pp):
            (r, _g), ns = ae.autoencoder_apply(pp, s, inc, msk, training=True)
            return chamfer_ops.chamfer_distance(r, comp).mean(), ns
        return jax.value_and_grad(lf, has_aux=True)(p_)[1]

    f_pg = jax.jit(pre_grads)
    dt = timed(f_pg, p, key, pc)
    print(f"preprocess+grads (fused):   {dt*1e3:8.2f} ms", flush=True)

    def grads_args(p_, inc, msk, comp):
        def lf(pp):
            (r, _g), ns = ae.autoencoder_apply(pp, s, inc, msk, training=True)
            return chamfer_ops.chamfer_distance(r, comp).mean(), ns
        return jax.value_and_grad(lf, has_aux=True)(p_)[1]

    f_ga = jax.jit(grads_args)
    dt = timed(f_ga, p, incomplete, mask, complete)
    print(f"grads (runtime inputs):     {dt*1e3:8.2f} ms", flush=True)

    bn_stats = config.training.bn_stats
    for bs_name in ("centered", bn_stats):
        full = lambda p_, s_, o_, b, k: steps.ae_train_step(
            p_, s_, o_, b, k, optimizer=opt, bn_stats=bs_name)
        dt = timed(full, p, s, o, batch, key)
        print(f"FULL ae_train_step ({bs_name}): {dt*1e3:8.2f} ms  "
              f"({bsz/dt:,.0f} clouds/s)", flush=True)
        if bs_name == bn_stats:
            break


if __name__ == "__main__":
    main()
