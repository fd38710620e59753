"""Config system tests, including compatibility with the reference YAMLs."""

import os

import pytest

from gan_rl_3d_tpu.config import Config, load_config


def test_defaults():
    c = Config()
    assert c.model.autoencoder.latent_dim == 128
    assert c.model.lgan.generator_dims == (256, 512, 512, 256, 128)
    td3 = c.td3_config()
    assert td3.policy_delay == 2
    assert td3.actor_hidden == (400, 400, 300, 300)


def test_load_own_config():
    c = load_config("configs/config.yaml")
    assert c.training.autoencoder.lr == 1e-3
    assert c.training.lgan.d_steps == 3
    assert c.model.autoencoder.num_points == 2048
    assert c.loss.w_chamfer == 100.0
    assert "chamfer_distance" in c.evaluation.metrics
    # the shipped flagship recipe is the validated z8 stack
    # (runs/best5/RESULTS.md); the action space must stay consistent
    assert c.model.lgan.z_dim == 8
    assert c.model.rl_agent.action_dim == c.model.lgan.z_dim
    assert c.training.rl_agent.actor_warmup == 2000
    assert c.training.joint.calibrate_gate
    assert c.training.joint.w_ae_recon == 1.0


@pytest.mark.skipif(not os.path.exists("/root/reference/configs/config.yaml"),
                    reason="reference not mounted")
def test_load_reference_config():
    """The reference's own YAML (with its string scientific notation and
    extra keys) must parse — checkpoint/config migration path."""
    c = load_config("/root/reference/configs/config.yaml")
    assert c.model.rl_agent.actor_lr == 1e-4
    assert isinstance(c.model.rl_agent.actor_lr, float)
    assert c.training.lgan.lambda_gp == 10.0
    assert c.training.rl_agent.policy_delay == 2
    assert c.model.lgan.z_dim == 1
    # reference device string is carried but ignored by the TPU runtime
    assert c.training.device == "mps"
    td3 = c.td3_config()
    assert td3.exploration_noise == 0.1


def test_overrides_and_unknown_keys(caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        c = load_config(None, overrides={
            "training": {"batch_size": 64, "bogus_key": 1},
            "model": {"autoencoder": {"latent_dim": 64}},
        })
    assert c.training.batch_size == 64
    assert c.model.autoencoder.latent_dim == 64
    assert any("bogus_key" in r.message for r in caplog.records)


def test_numeric_string_coercion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("training:\n  autoencoder:\n    lr: '1e-4'\n"
                 "    weight_decay: 1e-5\n")
    c = load_config(str(p))
    assert c.training.autoencoder.lr == 1e-4
    assert c.training.autoencoder.weight_decay == 1e-5
