"""Optimizer parity: our optax chains reproduce the reference's torch
optimizers step for step (Adam + weight decay + StepLR; GAN Adam betas)."""

import jax.numpy as jnp
import numpy as np
import torch

from gan_rl_3d_tpu.config import AETrainConfig, LGANTrainConfig
from gan_rl_3d_tpu.train import steps


def test_ae_adam_weight_decay_steplr_matches_torch():
    """torch.optim.Adam(lr, weight_decay) + StepLR vs make_ae_optimizer
    (reference train_rl_gan_net.py:178-188)."""
    cfg = AETrainConfig(lr=1e-3, weight_decay=1e-2, scheduler_step=2,
                        scheduler_gamma=0.5)
    steps_per_epoch = 3
    opt = steps.make_ae_optimizer(cfg, steps_per_epoch)

    rng = np.random.RandomState(0)
    w0 = rng.randn(16).astype(np.float32)
    gs = [rng.randn(16).astype(np.float32) for _ in range(12)]

    # torch side: scheduler steps per epoch (every steps_per_epoch batches)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=cfg.lr, weight_decay=cfg.weight_decay)
    sched = torch.optim.lr_scheduler.StepLR(opt_t, step_size=cfg.scheduler_step,
                                            gamma=cfg.scheduler_gamma)
    wj = jnp.asarray(w0)
    state = opt.init(wj)
    for i, g in enumerate(gs):
        opt_t.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt_t.step()
        if (i + 1) % steps_per_epoch == 0:
            sched.step()
        upd, state = opt.update(jnp.asarray(g), state, wj)
        wj = wj + upd
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gan_adam_betas_match_torch():
    """Adam(lr, betas=(0.5, 0.9)) (reference latent_gan.py:315-320)."""
    cfg = LGANTrainConfig(beta1=0.5, beta2=0.9)
    opt = steps.make_gan_optimizer(1e-4, cfg)

    rng = np.random.RandomState(1)
    w0 = rng.randn(16).astype(np.float32)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=1e-4, betas=(0.5, 0.9))
    wj = jnp.asarray(w0)
    state = opt.init(wj)
    for i in range(10):
        g = rng.randn(16).astype(np.float32)
        opt_t.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt_t.step()
        upd, state = opt.update(jnp.asarray(g), state, wj)
        wj = wj + upd
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-4, atol=1e-6)
