"""Mid-phase resume fidelity: periodic checkpoints persist the phase's
optimizer moments (and the RL replay buffer), and --resume restores them
instead of silently re-initialising the trajectory (the reference persists
only the agent's optimizers, rl_agent.py:369-381, and never restores any
of it mid-phase)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset
from gan_rl_3d_tpu.train import RLGANNetTrainer
from gan_rl_3d_tpu.train import replay_buffer as rb

N_POINTS = 256


def _make_config(root, **training_overrides):
    data_dir = root / "data"
    if not data_dir.exists():
        create_synthetic_dataset(str(data_dir), samples_per_category=4,
                                 num_points=N_POINTS,
                                 categories=("airplane", "chair"))
    training = {
        "batch_size": 8,
        "checkpoint_dir": str(root / "ckpt"),
        "log_dir": str(root / "logs"),
        "results_dir": str(root / "results"),
        "autoencoder": {"epochs": 3, "batch_size": 8, "scheduler_step": 1},
        "lgan": {"epochs": 2, "batch_size": 8, "d_steps": 1},
        "rl_agent": {"episodes": 24, "envs_per_step": 8,
                     "start_training_steps": 8},
        "joint": {"enabled": True, "epochs": 2},
    }
    training.update(training_overrides)
    return load_config(None, overrides={
        "model": {
            "autoencoder": {"num_points": N_POINTS,
                            "decoder_dims": [256, 256, N_POINTS * 3]},
            "rl_agent": {"batch_size": 16, "buffer_size": 512},
        },
        "training": training,
        "logging": {"save_model_frequency": 1, "use_tensorboard": False},
        "data": {"data_dir": str(root / "data")},
    })


@pytest.fixture(scope="module")
def resume_root(tmp_path_factory):
    return tmp_path_factory.mktemp("resume")


def _ae_losses(log_dir):
    losses = {}
    for line in (log_dir / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if rec["tag"] == "AE/Train_Loss":
            losses[rec["step"]] = rec["value"]
    return losses


def test_ae_midphase_resume_continues_trajectory(resume_root):
    config = _make_config(resume_root)
    trainer_a = RLGANNetTrainer(config, use_orbax=False)
    trainer_a.train_autoencoder(3)
    a_losses = _ae_losses(trainer_a.logger.log_dir)
    trainer_a.close()

    ckpt_dir = resume_root / "ckpt"
    assert (ckpt_dir / "autoencoder_epoch_2_trainstate").exists()

    # run B logs to its own dir (same checkpoint_dir, fresh metrics file)
    config_b = _make_config(resume_root, log_dir=str(resume_root / "logs_b"))
    trainer_b = RLGANNetTrainer(config_b, use_orbax=False)
    trainer_b.load_checkpoint("autoencoder_epoch_2")
    trainer_b.train_autoencoder(3)
    b_losses = _ae_losses(trainer_b.logger.log_dir)
    trainer_b.close()

    # resumed run trains ONLY the remaining epoch (epoch index 2)
    assert set(b_losses) == {2}
    # and continues the curve instead of restarting: its epoch-3 loss sits
    # at the trained level, not back at the fresh-init epoch-1 level
    assert b_losses[2] < a_losses[0] * 1.05
    assert np.isfinite(b_losses[2])


def test_rl_buffer_roundtrips_through_trainstate(resume_root):
    config = _make_config(resume_root)
    trainer_a = RLGANNetTrainer(config, use_orbax=False)
    trainer_a.load_checkpoint("autoencoder_epoch_2")  # any trained AE
    trainer_a._resume = None
    trainer_a.generate_gfvs()
    trainer_a.train_rl_agent(24)
    trainer_a.close()

    ckpt_dir = resume_root / "ckpt"
    state_paths = sorted(ckpt_dir.glob("rl_agent_episode_*_trainstate"))
    assert state_paths, "periodic RL checkpoints must carry train state"

    trainer_b = RLGANNetTrainer(config, use_orbax=False)
    name = state_paths[-1].name[:-len("_trainstate")]
    trainer_b.load_checkpoint(name)
    target = {"buffer": rb.buffer_init(512, 128, 1),
              "ou": jnp.zeros((8, 1)),
              "best_avg": np.float32(0), "it": np.int32(0)}
    rst = trainer_b._restore_train_state("rl_agent", target)
    assert rst is not None
    buf = rst["buffer"]
    assert int(buf.size) > 0
    # ring contents survived byte-exact
    assert np.any(np.asarray(buf.states) != 0)
    assert np.all(np.isfinite(np.asarray(buf.rewards)[:int(buf.size)]))
    assert int(rst["it"]) >= 0
    trainer_b.close()


def test_resumed_rl_phase_runs_remaining_iters_only(resume_root):
    config = _make_config(resume_root)
    trainer = RLGANNetTrainer(config, use_orbax=False)
    ckpt_dir = resume_root / "ckpt"
    state_paths = sorted(ckpt_dir.glob("rl_agent_episode_*_trainstate"))
    name = state_paths[-1].name[:-len("_trainstate")]
    trainer.load_checkpoint(name)
    # 24 episodes / 8 envs = 3 iters; resuming from the last periodic
    # checkpoint leaves at most one iteration to run — must not crash and
    # must preserve the restored buffer contents in the continued run
    trainer.train_rl_agent(24)
    trainer.close()


def test_later_phase_does_not_consume_foreign_trainstate(resume_root):
    """Resuming from an AE checkpoint must not feed AE optimizer moments
    into the lgan/joint phases — the resume record is phase-keyed."""
    config = _make_config(resume_root)
    trainer = RLGANNetTrainer(config, use_orbax=False)
    trainer.load_checkpoint("autoencoder_epoch_2")
    assert trainer._restore_train_state("lgan", {}) is None
    # the AE record is still intact for its own phase
    assert trainer._resume is not None
    trainer.close()
