#!/usr/bin/env python
"""Standalone integration demo (parity with reference test_rl_gan_net.py):
builds the model from an inline config, runs every phase's forward, the full
inference path, and a checkpoint save->load round trip, printing shapes.
"""

import tempfile

import jax
import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.utils import checkpoint as ckpt


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    config = load_config(None, overrides={
        "model": {"rl_agent": {"buffer_size": 10000, "batch_size": 32}},
    })
    td3 = config.td3_config()
    key = jax.random.PRNGKey(0)
    model = net.init_model(key, config)
    print("RL-GAN-Net (TPU) integration test")
    print(f"devices: {jax.devices()}")

    batch_size, num_points = 4, config.model.autoencoder.num_points
    pc = jax.random.normal(key, (batch_size, num_points, 3))
    print(f"input shape: {pc.shape}")

    res = net.forward(model, pc, phase="autoencoder", mode="training")
    print(f"[autoencoder] noisy GFV {res['noisy_gfv'].shape}, "
          f"reconstruction {res['ae_reconstruction'].shape}")

    res = net.forward(model, pc, phase="lgan", mode="training", key=key)
    print(f"[lgan] clean GFV {res['clean_gfv'].shape}, "
          f"completed {res['completed_pc'].shape}")

    res = net.forward(model, pc, phase="rl_agent", mode="training", cfg=td3)
    print(f"[rl_agent] z {res['z_vector'].shape}, "
          f"completed {res['completed_pc'].shape}")

    res = jax.jit(lambda m, x: net.complete(m, x, cfg=td3))(model, pc)
    print(f"[inference] hybrid output {res['hybrid_output'].shape}, "
          f"scores {res['rl_gan_score'].shape}")

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ckpt"
        ckpt.save_checkpoint(path, {"model": model}, use_orbax=False)
        model2 = net.init_model(jax.random.PRNGKey(99), config)
        restored = ckpt.load_checkpoint(path, {"model": model2},
                                        use_orbax=False)["model"]
        out1 = net.complete(model, pc, cfg=td3)["completed_pc"]
        out2 = net.complete(restored, pc, cfg=td3)["completed_pc"]
        assert np.allclose(np.asarray(out1), np.asarray(out2)), \
            "checkpoint round trip changed outputs"
        print("[checkpoint] save -> load round trip OK")

    print("All integration checks passed")


if __name__ == "__main__":
    main()
