"""Config-selected variants run through the full composite pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.train import steps

N = 256
VARIANT_CFG = {
    "model": {"autoencoder": {"num_points": N,
                              "decoder_dims": [256, 256, N * 3],
                              "encoder_type": "attention",
                              "decoder_type": "adaptive"}},
}


def test_variant_model_full_paths():
    config = load_config(None, overrides=VARIANT_CFG)
    model = net.init_model(jax.random.PRNGKey(0), config)
    assert "attention" in model["ae"]["params"]["encoder"]
    assert "feature_mlp" in model["ae"]["params"]["decoder"]

    pc = jax.random.normal(jax.random.PRNGKey(1), (2, N, 3))
    out = jax.jit(lambda m, x: net.complete(m, x, cfg=config.td3_config()))(
        model, pc)
    assert out["hybrid_output"].shape == (2, N, 3)
    assert np.all(np.isfinite(np.asarray(out["hybrid_output"])))

    # AE train step differentiates through both variants
    opt = steps.make_ae_optimizer(config.training.autoencoder, 10)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    batch = {"complete_pc": pc, "pad": jnp.zeros((2,))}
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(10):
        params, state, opt_state, m = steps.ae_train_step(
            params, state, opt_state, batch, jax.random.fold_in(key, i),
            optimizer=opt, augment=False)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # joint step too (encoder+decoder variants inside the composite)
    jopt = steps.make_joint_optimizer(config.training.joint)
    model["ae"] = {"params": params, "state": state}
    jstate = jopt.init({"ae": model["ae"]["params"],
                        "gen": model["lgan"]["params"]["generator"]})
    model2, _, jm = steps.joint_train_step(model, jstate, batch,
                                           key, optimizer=jopt,
                                           cfg=config.td3_config())
    assert np.isfinite(float(jm["loss"]))
