"""joint.preserve_gan_path: phase 5 snapshots the (generator, decoder)
pair and the SERVING GAN branch routes through it, so joint fine-tuning
cannot degrade the GAN path's own ceiling (the measured pathology:
sampled oracle 0.0233 -> ~0.032 through joint whether or not G is frozen,
runs/best5/RESULTS.md). The reference has no counterpart — its phase 5
serves the shifted stack (reference train_rl_gan_net.py:493-522)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset
from gan_rl_3d_tpu.models import inference
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.train import RLGANNetTrainer

N_POINTS = 256


def _tree_equal(a, b):
    return all(
        jax.tree.leaves(jax.tree.map(
            lambda x, y: bool(jnp.array_equal(x, y)), a, b)))


@pytest.fixture(scope="module")
def preserve_setup(tmp_path_factory):
    """Tiny pipeline through phases 1-4, snapshot of the pre-joint stack,
    then phase 5 + 5.5 with preserve_gan_path on."""
    root = tmp_path_factory.mktemp("preserve")
    data_dir = root / "data"
    create_synthetic_dataset(str(data_dir), samples_per_category=4,
                             num_points=N_POINTS,
                             categories=("airplane", "chair"))
    config = load_config(None, overrides={
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
            "joint": {"enabled": True, "epochs": 2, "w_ae_recon": 1.0,
                      "refresh_d_steps": 4, "calibrate_gate": True,
                      "preserve_gan_path": True},
        },
        "data": {"data_dir": str(data_dir)},
    })
    trainer = RLGANNetTrainer(config, use_orbax=False)
    trainer.train_autoencoder()
    trainer.generate_gfvs()
    trainer.train_latent_gan()
    trainer.train_rl_agent()
    pre_joint = {
        "generator": {
            "params": trainer.model["lgan"]["params"]["generator"],
            "state": trainer.model["lgan"]["state"]["generator"]},
        "decoder": {
            "params": trainer.model["ae"]["params"]["decoder"],
            "state": trainer.model["ae"]["state"]["decoder"]},
    }
    trainer.joint_training()
    trainer.post_joint_refresh()
    trainer.save_checkpoint("final", trainer.epoch, "joint")
    yield config, trainer, pre_joint
    trainer.close()


def test_knob_default_off():
    config = load_config(None)
    assert config.training.joint.preserve_gan_path is False


def test_snapshot_is_prejoint_stack(preserve_setup):
    _, trainer, pre_joint = preserve_setup
    snap = trainer.model.get("gan_path")
    assert snap is not None, "joint phase did not install the snapshot"
    assert _tree_equal(snap, pre_joint), (
        "gan_path snapshot drifted from the pre-joint generator/decoder")
    # joint actually moved the live stack, so the snapshot is load-bearing
    assert not _tree_equal(pre_joint["decoder"]["params"],
                           trainer.model["ae"]["params"]["decoder"])


def test_complete_serves_snapshot_gan_branch(preserve_setup):
    config, trainer, pre_joint = preserve_setup
    data = trainer.val_loader.dataset.as_array()[:8]
    model = trainer.model

    out = net.complete(model, data, cfg=trainer.td3)
    # the GAN branch of complete() must equal explicitly applying the
    # pre-joint stack to the same z
    z = out["z_vector"]
    from gan_rl_3d_tpu.models import autoencoder as ae
    from gan_rl_3d_tpu.models import latent_gan as lg
    gfv_ref, _ = lg.generator_apply(pre_joint["generator"]["params"],
                                    pre_joint["generator"]["state"], z,
                                    training=False)
    pc_ref, _ = ae.any_decoder_apply(pre_joint["decoder"]["params"],
                                     pre_joint["decoder"]["state"], gfv_ref,
                                     training=False)
    np.testing.assert_array_equal(np.asarray(out["clean_gfv"]),
                                  np.asarray(gfv_ref))
    np.testing.assert_array_equal(np.asarray(out["completed_pc"]),
                                  np.asarray(pc_ref))
    # the AE branch must use the LIVE (post-joint) decoder: decoding the
    # noisy gfv through the snapshot decoder must differ
    pc_snap_dec, _ = ae.any_decoder_apply(
        pre_joint["decoder"]["params"], pre_joint["decoder"]["state"],
        out["noisy_gfv"], training=False)
    assert not np.array_equal(np.asarray(out["ae_reconstruction"]),
                              np.asarray(pc_snap_dec))


def test_checkpoint_sibling_roundtrip(preserve_setup):
    config, trainer, pre_joint = preserve_setup
    # fresh trainer: loading a post-joint checkpoint restores the snapshot
    t2 = RLGANNetTrainer(config, use_orbax=False)
    assert "gan_path" not in t2.model
    t2.load_checkpoint("final")
    assert _tree_equal(t2.model["gan_path"], pre_joint)
    # loading a pre-joint checkpoint drops the in-memory snapshot
    t2.load_checkpoint("rl_agent_final")
    assert "gan_path" not in t2.model
    t2.close()


def test_engine_folds_snapshot(preserve_setup):
    config, trainer, _ = preserve_setup
    model = trainer.model
    engine = inference.prepare_inference_engine(model)
    assert "gan_decoder" in engine and "gan_generator" in engine
    data = trainer.val_loader.dataset.as_array()[:8]
    ref = net.complete(model, data, cfg=trainer.td3)
    fast = inference.complete_fast(engine, data)
    np.testing.assert_allclose(np.asarray(fast["completed_pc"]),
                               np.asarray(ref["completed_pc"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast["ae_reconstruction"]),
                               np.asarray(ref["ae_reconstruction"]),
                               atol=2e-3)
    # gate inputs agree (the routing itself can flip on a borderline
    # sample at affine-reassociation tolerance, so compare scores, not
    # the routed output)
    np.testing.assert_allclose(np.asarray(fast["rl_gan_score"]),
                               np.asarray(ref["rl_gan_score"]),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(fast["ae_score"]),
                               np.asarray(ref["ae_score"]),
                               atol=1e-2)


def test_stale_ganpath_sibling_removed(preserve_setup):
    """Re-saving a checkpoint name WITHOUT a snapshot must delete a
    lingering _ganpath sibling from a previous preserve run — otherwise a
    plain re-run would silently resurrect the old serving branch."""
    config, trainer, _ = preserve_setup
    trainer.save_checkpoint("stale_test", 0, "joint")
    sib = trainer.checkpoint_dir / "stale_test_ganpath"
    assert sib.exists()
    gp = trainer.model.pop("gan_path")
    try:
        trainer.save_checkpoint("stale_test", 0, "joint")
        assert not sib.exists()
    finally:
        trainer.model["gan_path"] = gp


def test_d_refresh_draws_fakes_from_snapshot(preserve_setup):
    """The refresh must not overwrite the live generator with the snapshot
    (and vice versa): after phase 5.5 the live G is still the post-joint
    one while serving uses the snapshot."""
    config, trainer, pre_joint = preserve_setup
    if config.training.joint.freeze_generator:
        pytest.skip("freeze_generator keeps live G == snapshot")
    assert not _tree_equal(trainer.model["lgan"]["params"]["generator"],
                           pre_joint["generator"]["params"])
