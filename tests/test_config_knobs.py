"""Every parsed config knob changes behaviour.

Round-1 review found several knobs parsed into dataclasses and never read
(data.augmentation.*, data.normalize/center/unit_sphere, loss.chamfer_loss,
loss.reconstruction_loss, logging.use_wandb, training.num_workers) — the
exact sin the reference commits (it parses config.yaml:87-88,100-109,119 and
ignores them all). These tests pin each knob to an observable effect.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.ops import pointcloud as pc_ops
from gan_rl_3d_tpu.ops.pointcloud import PreprocSpec


def _cloud(batch=4, n=128, seed=0):
    rng = np.random.RandomState(seed)
    pc = rng.randn(batch, n, 3).astype(np.float32)
    return jnp.asarray(pc)


def _batch_out(spec, *, do_augment=True, seed=0):
    key = jax.random.PRNGKey(seed)
    return pc_ops.make_training_batch(key, _cloud(), spec=spec,
                                      do_augment=do_augment)


def test_preproc_spec_built_from_config():
    cfg = load_config(None, overrides={
        "data": {"augmentation": {"rotation": False, "jitter": False},
                 "normalize": False, "hole_min_ratio": 0.1,
                 "hole_max_ratio": 0.3}})
    spec = cfg.preproc_spec()
    assert spec.rotation is False and spec.jitter is False
    assert spec.scale is True  # untouched default
    assert spec.normalize is False
    assert (spec.hole_min, spec.hole_max) == (0.1, 0.3)


@pytest.mark.parametrize("flag", ["rotation", "jitter", "scale"])
def test_augmentation_flags_gate_transforms(flag):
    import dataclasses

    # normalize=False: unit-sphere normalisation would cancel a global
    # scale exactly (as it does in the reference), hiding the scale flag
    base = PreprocSpec(rotation=False, jitter=False, scale=False,
                       normalize=False)
    on = dataclasses.replace(base, **{flag: True})
    key = jax.random.PRNGKey(0)
    clouds = _cloud(32, 128)
    c_off, _, _ = pc_ops.make_training_batch(key, clouds, spec=base)
    c_on, _, _ = pc_ops.make_training_batch(key, clouds, spec=on)
    # same key: with the flag off the transform can never fire; with it on,
    # at least one of 32 samples draws below the trigger probability (the
    # no-fire chance is at most 0.7^32 ~ 1e-5)
    assert not np.allclose(np.asarray(c_off), np.asarray(c_on))


def test_augmentation_all_off_is_deterministic_identity():
    spec = PreprocSpec(rotation=False, jitter=False, scale=False)
    c1, _, _ = _batch_out(spec, seed=0)
    c2, _, _ = _batch_out(spec, seed=1)
    # augmentation fully disabled: the complete cloud is just normalised,
    # independent of the augmentation key draws
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_normalize_master_switch():
    raw = _cloud() * 7.3  # far outside the unit sphere
    key = jax.random.PRNGKey(0)
    spec_off = PreprocSpec(rotation=False, jitter=False, scale=False,
                           normalize=False)
    spec_on = PreprocSpec(rotation=False, jitter=False, scale=False)
    c_off, _, _ = pc_ops.make_training_batch(key, raw, spec=spec_off,
                                             do_augment=False)
    c_on, _, _ = pc_ops.make_training_batch(key, raw, spec=spec_on,
                                            do_augment=False)
    r_off = float(jnp.max(jnp.linalg.norm(c_off, axis=-1)))
    r_on = float(jnp.max(jnp.linalg.norm(c_on, axis=-1)))
    assert r_off > 2.0  # untouched
    assert r_on <= 1.0 + 1e-5


def test_center_and_unit_sphere_flags_independent():
    raw = _cloud() + 5.0  # clearly off-centre
    centered = pc_ops.apply_normalization(
        raw, spec=PreprocSpec(unit_sphere=False))
    np.testing.assert_allclose(
        np.asarray(jnp.mean(centered, axis=-2)), 0.0, atol=1e-5)
    assert float(jnp.max(jnp.linalg.norm(centered, axis=-1))) > 1.5

    scaled = pc_ops.apply_normalization(
        raw, spec=PreprocSpec(center=False))
    assert float(jnp.max(jnp.linalg.norm(scaled, axis=-1))) <= 1.0 + 1e-5
    # not centered: the mean stays displaced toward the original offset
    assert float(jnp.linalg.norm(jnp.mean(scaled, axis=-2))) > 0.1


def test_hole_ratio_bounds_respected():
    big = PreprocSpec(rotation=False, jitter=False, scale=False,
                      hole_min=0.45, hole_max=0.5)
    small = PreprocSpec(rotation=False, jitter=False, scale=False,
                        hole_min=0.0, hole_max=0.05)
    _, _, m_big = _batch_out(big, do_augment=False)
    _, _, m_small = _batch_out(small, do_augment=False)
    n = m_big.shape[-1]
    assert float(jnp.max(jnp.sum(m_big, -1))) <= 0.55 * n + 1
    assert float(jnp.min(jnp.sum(m_small, -1))) >= 0.94 * n - 1


def test_chamfer_loss_knob_changes_loss():
    from gan_rl_3d_tpu.models import autoencoder as ae
    from gan_rl_3d_tpu.train import steps

    params, state = ae.autoencoder_init(
        jax.random.PRNGKey(0), num_points=64, decoder_dims=(64, 64, 192))
    batch = {"complete_pc": _cloud(2, 64),
             "pad": jnp.zeros((2,), jnp.float32)}
    key = jax.random.PRNGKey(1)
    bi = steps.ae_eval_step(params, state, batch, key, bidirectional=True)
    fwd = steps.ae_eval_step(params, state, batch, key, bidirectional=False)
    assert abs(float(bi["loss"]) - float(fwd["loss"])) > 1e-6


def test_reconstruction_loss_knob_changes_loss():
    from gan_rl_3d_tpu.models import autoencoder as ae
    from gan_rl_3d_tpu.train import steps

    params, state = ae.autoencoder_init(
        jax.random.PRNGKey(0), num_points=64, decoder_dims=(64, 64, 192))
    batch = {"complete_pc": _cloud(2, 64),
             "pad": jnp.zeros((2,), jnp.float32)}
    key = jax.random.PRNGKey(1)
    ch = steps.ae_eval_step(params, state, batch, key, recon_loss="chamfer")
    mse = steps.ae_eval_step(params, state, batch, key, recon_loss="mse")
    assert abs(float(ch["loss"]) - float(mse["loss"])) > 1e-6
    assert np.isfinite(float(mse["loss"]))


def test_invalid_loss_knobs_rejected():
    with pytest.raises(ValueError, match="chamfer_loss"):
        load_config(None, overrides={"loss": {"chamfer_loss": "emd"}})
    with pytest.raises(ValueError, match="reconstruction_loss"):
        load_config(None, overrides={"loss": {"reconstruction_loss": "l1"}})


def test_num_workers_reaches_parallel_loader(tmp_path, monkeypatch):
    from gan_rl_3d_tpu.data import dataset as ds
    from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset

    create_synthetic_dataset(str(tmp_path), samples_per_category=2,
                             num_points=64, categories=("airplane",))
    seen = {}
    import gan_rl_3d_tpu.runtime as rt
    real = rt.load_files_parallel

    def spy(paths, target, seed=1, workers=8):
        seen["workers"] = workers
        return real(paths, target, seed=seed, workers=workers)

    monkeypatch.setattr(rt, "load_files_parallel", spy)
    d = ds.ShapeNetDataset(str(tmp_path), "train", 64, workers=3)
    assert d.workers == 3
    if seen:  # C++ runtime available on this machine
        assert seen["workers"] == 3


def test_use_wandb_degrades_gracefully(tmp_path, caplog):
    import logging as pylog

    from gan_rl_3d_tpu.utils.metrics_logging import MetricsLogger

    with caplog.at_level(pylog.WARNING):
        lg = MetricsLogger(str(tmp_path), use_wandb=True)
    try:
        import wandb  # noqa: F401
        assert lg._wandb is not None
    except ImportError:
        assert lg._wandb is None
        assert any("wandb" in r.message for r in caplog.records)
    lg.log_scalar("AE/Train_Loss", 1.0, 0)
    lg.close()


def test_ae_lr_schedule_knob():
    """autoencoder.lr_schedule="cosine" must change the optimizer's LR
    trajectory (vs torch-parity StepLR) and reject unknown values."""
    import optax
    from gan_rl_3d_tpu.train import steps

    step_cfg = load_config(None, overrides={
        "training": {"autoencoder": {"epochs": 4, "scheduler_step": 1,
                                     "scheduler_gamma": 0.5}}})
    cos_cfg = load_config(None, overrides={
        "training": {"autoencoder": {"epochs": 4, "lr_schedule": "cosine"}}})
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}

    def lr_trace(cfg):
        opt = steps.make_ae_optimizer(cfg.training.autoencoder, 1)
        state = opt.init(params)
        seen = []
        p = params
        for _ in range(4):
            upd, state = opt.update(grads, state, p)
            seen.append(float(-upd["w"][0]))  # ~lr for unit adam-scaled grad
            p = optax.apply_updates(p, upd)
        return seen

    s, c = lr_trace(step_cfg), lr_trace(cos_cfg)
    assert not np.allclose(s, c)
    assert c[0] > c[-1] > 0  # cosine decays monotonically here
    with pytest.raises(ValueError):
        load_config(None, overrides={
            "training": {"autoencoder": {"lr_schedule": "linear"}}})


def test_ae_hole_curriculum_stages():
    """hole_curriculum scales the train-time hole bounds in 3 easy->target
    stages while validation keeps the full spec."""
    from gan_rl_3d_tpu.train.trainer import RLGANNetTrainer

    cfg = load_config(None, overrides={
        "training": {"autoencoder": {"hole_curriculum": True}},
        "data": {"hole_min_ratio": 0.3, "hole_max_ratio": 0.6}})
    spec = cfg.preproc_spec()

    class _Stub:
        config = cfg
        preproc = spec

    got = [RLGANNetTrainer._ae_train_spec(_Stub(), e, 9) for e in range(9)]
    assert [g.hole_max for g in got[:3]] == [pytest.approx(0.2)] * 3
    assert [g.hole_max for g in got[3:6]] == [pytest.approx(0.4)] * 3
    assert got[8].hole_max == pytest.approx(0.6)
    assert got[8].hole_min == pytest.approx(0.3)
    assert len({id(g) for g in got}) >= 3  # distinct static specs
    # off by default: identity
    cfg2 = load_config(None)
    _Stub.config, _Stub.preproc = cfg2, cfg2.preproc_spec()
    assert RLGANNetTrainer._ae_train_spec(_Stub(), 5, 9) is _Stub.preproc
