"""AE-phase probe for selective bf16 recipes (docs/PERF.md reject #6 study).

The measured ladder so far (flagship data, 20 AE epochs, best val chamfer):
f32 0.0244 | bf16 0.0404 | +f32 decoder head 0.0384 | +f32 input & first
encoder layer ("selective2") 0.0377. The train-loss gap (0.030 vs 0.042)
says the damage is optimization, not representation of the coordinates.
This probe tests the remaining targeted hypothesis: the bf16-quantized
encoder OUTPUT (the 128-d GFV bottleneck every decoder weight sees) is the
noise source. One recipe per process (jit caches key on static args, and
we patch the cast policy at module scope).

Usage:  python benchmarks/bf16_recipe_probe.py <recipe> [epochs]
Recipes:
  head_encout     f32 decoder head + f32 final encoder layer
  all_but_trunk   head + final-encoder + first-encoder + f32 input
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.data.dataset import BatchLoader, ShapeNetDataset
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.parallel import mesh as mesh_lib
from gan_rl_3d_tpu.train import steps

DATA = "/root/repo/runs/best/shapenet"


def make_cast(recipe: str):
    base = steps._policy_cast

    def cast(tree, dtype, keep_first=False):
        out = base(tree, dtype)
        mlp = list(out["decoder"]["mlp"])
        mlp[-1] = tree["decoder"]["mlp"][-1]
        out = dict(out, decoder=dict(out["decoder"], mlp=mlp))
        pm = list(out["encoder"]["point_mlp"])
        pm[-1] = tree["encoder"]["point_mlp"][-1]
        if recipe == "all_but_trunk":
            pm[0] = tree["encoder"]["point_mlp"][0]
        out = dict(out, encoder=dict(out["encoder"], point_mlp=pm))
        return out

    return cast


def main():
    recipe = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    assert recipe in ("head_encout", "all_but_trunk")
    steps._policy_cast_ae_selective = make_cast(recipe)
    # all_but_trunk also keeps the input coordinates f32, selective2-style
    selective = 2 if recipe == "all_but_trunk" else 1

    config = load_config(None)
    mesh = mesh_lib.make_mesh()
    fr = (0.8, 0.1, 0.1)
    train = BatchLoader(ShapeNetDataset(DATA, "train", 2048, seed=42,
                                        split_fractions=fr, workers=2),
                        64, shuffle=True, seed=42)
    val = BatchLoader(ShapeNetDataset(DATA, "val", 2048, seed=42,
                                      split_fractions=fr, workers=2),
                      64, shuffle=False, seed=42)
    print(f"recipe={recipe} train={len(train.dataset)} val={len(val.dataset)}")

    model = net.init_model(jax.random.PRNGKey(42), config)
    params, bn_state = model["ae"]["params"], model["ae"]["state"]
    opt = steps.make_ae_optimizer(config.training.autoencoder, len(train))
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(42)
    data_dev = jax.device_put(train.dataset.as_array(),
                              mesh_lib.replicated(mesh))
    best = float("inf")
    for ep in range(epochs):
        t0 = time.time()
        key, k = jax.random.split(key)
        order, pads = train.epoch_indices()
        params, bn_state, opt_state, m = steps.ae_train_epoch_resident(
            params, bn_state, opt_state, data_dev, jnp.asarray(order),
            jnp.asarray(pads), k, optimizer=opt,
            compute_dtype=jnp.bfloat16,
            batch_sharding=mesh_lib.batch_sharding(mesh),
            selective=selective)
        train_loss = float(np.asarray(m["losses"]).mean())
        vals = []
        vkey = jax.random.PRNGKey(0)
        for i, batch in enumerate(val):
            vm = steps.ae_eval_step(params, bn_state,
                                    mesh_lib.shard_batch(mesh, batch),
                                    jax.random.fold_in(vkey, i))
            vals.append(vm["loss"])
        v = float(jnp.mean(jnp.stack(vals)))
        best = min(best, v)
        print(f"ep {ep+1}/{epochs} train {train_loss:.6f} val {v:.6f} "
              f"({time.time()-t0:.1f}s)", flush=True)
    print(f"recipe={recipe}: best val {best:.6f}")


if __name__ == "__main__":
    main()
