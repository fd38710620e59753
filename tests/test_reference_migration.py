"""Reference checkpoint migration: a .pth saved in the reference's exact
format (rl_gan_net.py:237-251 + rl_agent.py:369-381) loads into this
framework and reproduces the reference model's outputs."""

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

from gan_rl_3d_tpu.config import Config, load_config  # noqa: E402
from gan_rl_3d_tpu.models import latent_gan as lg  # noqa: E402
from gan_rl_3d_tpu.models import rl_gan_net as net  # noqa: E402
from gan_rl_3d_tpu.utils import torch_convert as tc  # noqa: E402


def _reference_checkpoint(tmp_path):
    torch.manual_seed(0)
    ae = PointCloudAutoencoder()
    gan = LatentGAN()
    path = tmp_path / "joint_best.pth"
    torch.save({
        "epoch": 12,
        "phase": "joint",
        "config": {},
        "autoencoder_state_dict": ae.state_dict(),
        "latent_gan_state_dict": gan.state_dict(),
    }, path)
    agent = {}
    for name in ("actor", "actor_target"):
        agent[name] = Actor().state_dict()
    for name in ("critic1", "critic2", "critic1_target", "critic2_target"):
        agent[name] = Critic().state_dict()
    for name in ("actor_optimizer", "critic1_optimizer",
                 "critic2_optimizer"):
        agent[name] = {}
    torch.save(agent, tmp_path / "joint_best_rl_agent.pth")
    return str(path), ae, gan


def test_load_reference_checkpoint(tmp_path):
    path, ae_t, gan_t = _reference_checkpoint(tmp_path)
    bundle = tc.load_reference_checkpoint(path)
    assert bundle["meta"]["epoch"] == 12
    assert bundle["meta"]["phase"] == "joint"
    assert "agent_networks" in bundle

    # graft onto a fresh model and compare the full inference path with the
    # torch side (eval mode, no exploration noise)
    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    model["ae"] = bundle["ae"]
    model["lgan"] = bundle["lgan"]
    model["agent"]["actor"] = bundle["agent_networks"]["actor"]

    x = np.random.RandomState(0).randn(2, 2048, 3).astype(np.float32)
    ae_t.eval(), gan_t.eval()
    with torch.no_grad():
        noisy = ae_t.encode(torch.from_numpy(x))
        recon_t = ae_t.decode(noisy).numpy()
        score_t = gan_t.discriminate(noisy).numpy()
    out = net.complete(model, jnp.asarray(x), cfg=config.td3_config())
    np.testing.assert_allclose(np.asarray(out["ae_reconstruction"]), recon_t,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["ae_score"]), score_t,
                               rtol=1e-3, atol=1e-3)


def test_export_reference_checkpoint_strict_load(tmp_path):
    """Export direction: this framework's pytrees written as a reference
    .pth pair must survive a STRICT load into the reference torch modules
    (rl_gan_net.py:253-264 + rl_agent.py:383-395 consume both files) and
    reproduce this framework's outputs from the torch side."""
    from models.rl_agent import DDPGAgent

    from gan_rl_3d_tpu.models import rl_agent as ra

    config = Config()
    model = net.init_model(jax.random.PRNGKey(2), config)
    path = tmp_path / "export.pth"
    rl_path = tc.export_reference_checkpoint(model, str(path), epoch=7,
                                             phase="rl_agent")

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert (ckpt["epoch"], ckpt["phase"]) == (7, "rl_agent")
    ae_t = PointCloudAutoencoder()
    gan_t = LatentGAN()
    ae_t.load_state_dict(ckpt["autoencoder_state_dict"])  # strict
    gan_t.load_state_dict(ckpt["latent_gan_state_dict"])  # strict
    agent_t = DDPGAgent()
    agent_t.load(str(rl_path))  # 6 networks + 3 optimizer state dicts

    x = np.random.RandomState(1).randn(2, 2048, 3).astype(np.float32)
    ae_t.eval(), gan_t.eval(), agent_t.actor.eval()
    with torch.no_grad():
        gfv_t = ae_t.encode(torch.from_numpy(x))
        recon_t = ae_t.decode(gfv_t).numpy()
        score_t = gan_t.discriminate(gfv_t).numpy()
        act_t = agent_t.actor(gfv_t).numpy()

    td3 = config.td3_config()
    out = net.complete(model, jnp.asarray(x), cfg=td3)
    np.testing.assert_allclose(np.asarray(out["ae_reconstruction"]), recon_t,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["ae_score"]), score_t,
                               rtol=1e-3, atol=1e-3)
    a_ours, _ = ra.actor_apply(model["agent"]["actor"]["params"],
                               model["agent"]["actor"]["state"],
                               jnp.asarray(gfv_t.numpy()), cfg=td3,
                               training=False)
    np.testing.assert_allclose(np.asarray(a_ours), act_t,
                               rtol=1e-3, atol=1e-3)


def test_export_import_roundtrip():
    """export -> load_reference_checkpoint must be the identity on every
    exported tensor (ae, lgan incl. spectral u/v, all 6 agent networks)."""
    import tempfile

    config = Config()
    model = net.init_model(jax.random.PRNGKey(3), config)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/rt.pth"
        tc.export_reference_checkpoint(model, path)
        back = tc.load_reference_checkpoint(path)
    for section, orig in (("ae", model["ae"]), ("lgan", model["lgan"])):
        got = back[section]
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    for name, got in back["agent_networks"].items():
        orig = {"params": model["agent"][name]["params"],
                "state": model["agent"][name]["state"]}
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_plain_discriminator_variant():
    """spectral_norm=False selects the plain LayerNorm discriminator
    (reference LatentDiscriminator, latent_gan.py:64-104)."""
    config = load_config(None, overrides={
        "model": {"lgan": {"spectral_norm": False}}})
    model = net.init_model(jax.random.PRNGKey(1), config)
    d_state = model["lgan"]["state"]["discriminator"]
    assert all("sn" not in layer for layer in d_state["layers"])
    score, _ = lg.lgan_discriminate(model["lgan"]["params"],
                                    model["lgan"]["state"],
                                    jnp.ones((4, 128)), training=False)
    assert score.shape == (4, 1)
