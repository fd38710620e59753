"""End-to-end smoke: the full 5-phase pipeline on a tiny synthetic dataset,
plus checkpoint save/restore round trip — CPU-runnable (reference
config_quick role, SURVEY.md §4)."""

import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset
from gan_rl_3d_tpu.train import RLGANNetTrainer

N_POINTS = 256


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    create_synthetic_dataset(str(data_dir), samples_per_category=4,
                             num_points=N_POINTS,
                             categories=("airplane", "chair"))
    return load_config(None, overrides={
        "model": {
            "autoencoder": {"num_points": N_POINTS,
                            "decoder_dims": [256, 256, N_POINTS * 3]},
            "rl_agent": {"batch_size": 16, "buffer_size": 1000},
        },
        "training": {
            "batch_size": 8,
            "checkpoint_dir": str(root / "ckpt"),
            "log_dir": str(root / "logs"),
            "results_dir": str(root / "results"),
            "autoencoder": {"epochs": 2, "batch_size": 8,
                            "scheduler_step": 1},
            "lgan": {"epochs": 1, "batch_size": 8, "d_steps": 2},
            "rl_agent": {"episodes": 16, "envs_per_step": 8,
                         "start_training_steps": 8},
            "joint": {"enabled": True, "epochs": 1},
        },
        "data": {"data_dir": str(data_dir)},
    })


def test_full_pipeline(tiny_config):
    trainer = RLGANNetTrainer(tiny_config, use_orbax=False)
    ae_val = trainer.train_autoencoder()
    assert np.isfinite(ae_val)
    gfvs = trainer.generate_gfvs()
    assert gfvs["clean"].shape[1] == 128
    assert len(gfvs["clean"]) == len(trainer.train_loader.dataset)
    g_best = trainer.train_latent_gan()
    assert np.isfinite(g_best)
    rl_best = trainer.train_rl_agent()
    assert np.isfinite(rl_best)
    joint_val = trainer.joint_training()
    assert np.isfinite(joint_val)

    # metrics were logged
    logged = (trainer.logger.log_dir / "metrics.jsonl").read_text()
    for tag in ("AE/Train_Loss", "GAN/Generator_Loss", "RL/Average_Reward",
                "Joint/Val_Loss"):
        assert tag in logged
    trainer.close()


def test_checkpoint_roundtrip(tiny_config):
    trainer = RLGANNetTrainer(tiny_config, use_orbax=False)
    # perturb a weight so the restore is distinguishable from fresh init
    # (both trainers share the config seed)
    w = trainer.model["ae"]["params"]["encoder"]["point_mlp"][0]["dense"]["w"]
    trainer.model["ae"]["params"]["encoder"]["point_mlp"][0]["dense"]["w"] = \
        w + 0.125
    trainer.save_checkpoint("roundtrip_test", epoch=7, phase="lgan")

    trainer2 = RLGANNetTrainer(tiny_config, use_orbax=False)
    w_before = np.asarray(
        trainer2.model["ae"]["params"]["encoder"]["point_mlp"][0]["dense"]["w"])
    epoch, phase = trainer2.load_checkpoint("roundtrip_test")
    assert (epoch, phase) == (7, "lgan")
    w_after = np.asarray(
        trainer2.model["ae"]["params"]["encoder"]["point_mlp"][0]["dense"]["w"])
    np.testing.assert_allclose(w_after, w_before + 0.125, rtol=1e-6)
    trainer.close()
    trainer2.close()


def test_training_determinism(tiny_config):
    """Same config/seed -> bit-identical training trajectories (explicit
    PRNG keys everywhere; no hidden global state)."""
    def run():
        t = RLGANNetTrainer(tiny_config, use_orbax=False)
        loss = t.train_autoencoder(1)
        t.close()
        return loss

    assert run() == run()
