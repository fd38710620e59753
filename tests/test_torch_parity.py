"""Golden parity tests: reference torch models' weights converted into this
framework must reproduce the reference outputs within 1e-3 (BASELINE.md
north-star tolerance; in practice these pass at ~1e-5).

The reference implementation at /root/reference is imported read-only to
build the torch side of each comparison.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from models.autoencoder import PointCloudAutoencoder  # noqa: E402
from models.latent_gan import LatentGAN  # noqa: E402
from models.rl_agent import Actor, Critic  # noqa: E402

from gan_rl_3d_tpu.models import autoencoder as ae  # noqa: E402
from gan_rl_3d_tpu.models import latent_gan as lg  # noqa: E402
from gan_rl_3d_tpu.models import rl_agent as rl  # noqa: E402
from gan_rl_3d_tpu.utils import torch_convert as tc  # noqa: E402

TOL = dict(rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def torch_ae():
    torch.manual_seed(0)
    m = PointCloudAutoencoder()
    m.eval()
    return m


def test_autoencoder_parity(torch_ae):
    params, state = tc.convert_autoencoder(torch_ae.state_dict())
    x = np.random.RandomState(0).randn(4, 2048, 3).astype(np.float32)
    with torch.no_grad():
        recon_t, gfv_t = torch_ae(torch.from_numpy(x))
    (recon_j, gfv_j), _ = ae.autoencoder_apply(params, state,
                                               jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(gfv_j), gfv_t.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(), **TOL)


def test_latent_gan_parity():
    torch.manual_seed(1)
    m = LatentGAN()
    m.eval()
    params, state = tc.convert_latent_gan(m.state_dict())
    rng = np.random.RandomState(1)
    z = rng.randn(8, 1).astype(np.float32)
    gfv = rng.randn(8, 128).astype(np.float32)
    with torch.no_grad():
        fake_t = m.generate(torch.from_numpy(z)).numpy()
        score_t = m.discriminate(torch.from_numpy(gfv)).numpy()
    fake_j, _ = lg.lgan_generate(params, state, jnp.asarray(z), training=False)
    score_j, _ = lg.lgan_discriminate(params, state, jnp.asarray(gfv),
                                      training=False)
    np.testing.assert_allclose(np.asarray(fake_j), fake_t, **TOL)
    np.testing.assert_allclose(np.asarray(score_j), score_t, **TOL)


def test_actor_parity():
    torch.manual_seed(2)
    m = Actor()
    m.eval()
    params, state = tc.convert_actor(m.state_dict())
    x = np.random.RandomState(2).randn(4, 128).astype(np.float32)
    with torch.no_grad():
        a_t = m(torch.from_numpy(x)).numpy()
    a_j, _ = rl.actor_apply(params, state, jnp.asarray(x), cfg=rl.TD3Config(),
                            training=False)
    np.testing.assert_allclose(np.asarray(a_j), a_t, **TOL)


def test_critic_parity():
    torch.manual_seed(3)
    m = Critic()
    m.eval()
    params, state = tc.convert_critic(m.state_dict())
    rng = np.random.RandomState(3)
    s = rng.randn(4, 128).astype(np.float32)
    a = rng.randn(4, 1).astype(np.float32)
    with torch.no_grad():
        q_t = m(torch.from_numpy(s), torch.from_numpy(a)).numpy()
    q_j, _ = rl.critic_apply(params, state, jnp.asarray(s), jnp.asarray(a),
                             training=False)
    np.testing.assert_allclose(np.asarray(q_j), q_t, **TOL)


def test_composite_inference_parity(torch_ae):
    """encoder -> actor(eval, no noise) -> G -> decoder -> D-gated hybrid,
    replicating reference RLGANNet.forward(mode='inference')
    (rl_gan_net.py:128-171) minus its hardcoded exploration noise."""
    torch.manual_seed(4)
    gan = LatentGAN()
    gan.eval()
    actor = Actor()
    actor.eval()

    x = np.random.RandomState(4).randn(4, 2048, 3).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        noisy = torch_ae.encode(xt)
        z = actor(noisy)
        clean = gan.generate(z)
        completed = torch_ae.decode(clean)
        ae_recon = torch_ae.decode(noisy)
        better = (gan.discriminate(clean) > gan.discriminate(noisy)
                  ).float().unsqueeze(-1)
        hybrid_t = (better * completed + (1 - better) * ae_recon).numpy()

    from gan_rl_3d_tpu.config import Config
    from gan_rl_3d_tpu.models import rl_gan_net as net

    ae_p, ae_s = tc.convert_autoencoder(torch_ae.state_dict())
    lg_p, lg_s = tc.convert_latent_gan(gan.state_dict())
    actor_p, actor_s = tc.convert_actor(actor.state_dict())
    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    model["ae"] = {"params": ae_p, "state": ae_s}
    model["lgan"] = {"params": lg_p, "state": lg_s}
    model["agent"]["actor"] = {"params": actor_p, "state": actor_s}

    out = net.complete(model, jnp.asarray(x), cfg=config.td3_config())
    np.testing.assert_allclose(np.asarray(out["hybrid_output"]), hybrid_t,
                               **TOL)


def test_attention_encoder_parity():
    from models.autoencoder import PointNetWithAttention

    from gan_rl_3d_tpu.models import variants

    torch.manual_seed(5)
    m = PointNetWithAttention()
    m.eval()
    params, state = tc.convert_attention_encoder(m.state_dict())
    x = np.random.RandomState(5).randn(4, 512, 3).astype(np.float32)
    with torch.no_grad():
        gfv_t = m(torch.from_numpy(x)).numpy()
    gfv_j, _ = variants.attention_encoder_apply(params, state,
                                                jnp.asarray(x),
                                                training=False)
    np.testing.assert_allclose(np.asarray(gfv_j), gfv_t, **TOL)


def test_adaptive_decoder_parity():
    from models.autoencoder import AdaptivePointDecoder

    from gan_rl_3d_tpu.models import variants

    torch.manual_seed(6)
    m = AdaptivePointDecoder(max_points=512)
    m.eval()
    params, state = tc.convert_adaptive_decoder(m.state_dict())
    gfv = np.random.RandomState(6).randn(4, 128).astype(np.float32)
    with torch.no_grad():
        pc_t = m(torch.from_numpy(gfv)).numpy()
    pc_j, _ = variants.adaptive_decoder_apply(params, state,
                                              jnp.asarray(gfv),
                                              training=False)
    np.testing.assert_allclose(np.asarray(pc_j), pc_t, **TOL)
    # variable point count matches the reference slicing
    with torch.no_grad():
        pc_t256 = m(torch.from_numpy(gfv), num_points=256).numpy()
    pc_j256, _ = variants.adaptive_decoder_apply(params, state,
                                                 jnp.asarray(gfv),
                                                 num_points=256,
                                                 training=False)
    np.testing.assert_allclose(np.asarray(pc_j256), pc_t256, **TOL)
