"""TPU step-time probe: bn_stats=centered vs single_read_grouped.

docs/PERF.md rejection #7 measured a -9% AE-step win for single-read BN
moments but rejected every naive variant on the sharded-equivalence
guarantee. benchmarks/bn_stats_probe.py shows the shard-aligned grouped
variant is MORE partition-invariant than centered; this probe measures
whether the HBM-read saving still materialises on the chip.

Run on the real TPU (no other TPU client live):
    python benchmarks/bn_stats_perf.py [batch=1024]
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
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.train import steps


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    p, s = model["ae"]["params"], model["ae"]["state"]
    opt = steps.make_ae_optimizer(config.training.autoencoder, 100)
    o = opt.init(p)
    key = jax.random.PRNGKey(1)
    pc = jax.random.normal(key, (bsz, 2048, 3))
    batch = {"complete_pc": pc, "pad": jnp.zeros((bsz,))}

    for mode in ("centered", "single_read_grouped",
                 "centered", "single_read_grouped"):
        # warmup/compile
        p2, s2, o2, m = steps.ae_train_step(
            p, s, o, batch, key, optimizer=opt, augment=True, bn_stats=mode)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        iters = 20
        for i in range(iters):
            p2, s2, o2, m = steps.ae_train_step(
                p2, s2, o2, batch, jax.random.fold_in(key, i),
                optimizer=opt, augment=True, bn_stats=mode)
        _ = float(m["loss"])  # host fetch sync (block_until_ready lies)
        dt = (time.perf_counter() - t0) / iters
        print(f"bn_stats={mode:20s} B={bsz}: {dt*1e3:8.2f} ms/step  "
              f"({bsz/dt:,.0f} clouds/s)", flush=True)


if __name__ == "__main__":
    main()
