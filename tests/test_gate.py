"""Hybrid-gate calibration: threshold sweep correctness, sidecar
persistence, gate_bias routing in both completion paths, the AE-preserving
joint loss term, and the post-joint discriminator refresh (the phase-5.5
fix for the reference design's stale gate — reference
models/rl_gan_net.py:162-171 gates with a D that never sees post-joint
GFVs)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gan_rl_3d_tpu.config import Config, load_config
from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset
from gan_rl_3d_tpu.models import inference
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.train import RLGANNetTrainer, steps
from gan_rl_3d_tpu.train import gate as gate_lib


# ---------------------------------------------------------------------------
# calibrate_gate: pure threshold sweep
# ---------------------------------------------------------------------------


def test_calibrate_finds_separating_threshold():
    """Margins above 2.0 are exactly the samples where the GAN path wins;
    the sweep must find a threshold in that gap and beat both pure modes."""
    n = 64
    margin = np.concatenate([np.linspace(-3, 1, n // 2),
                             np.linspace(3, 5, n // 2)])
    cd_rl = np.where(margin > 2.0, 0.01, 0.09)
    cd_ae = np.full(n, 0.05)
    report = gate_lib.calibrate_gate(
        {"cd_rl": cd_rl, "cd_ae": cd_ae, "margin": margin})
    assert report["gate_mode"] == "discriminator"
    assert 1.0 < report["gate_bias"] < 3.0
    assert report["val_chamfer_calibrated"] == pytest.approx(
        (0.05 * (n // 2) + 0.01 * (n // 2)) / n)
    assert report["val_chamfer_calibrated"] < report["val_chamfer_rl"]
    assert report["val_chamfer_calibrated"] < report["val_chamfer_ae"]
    assert report["val_chamfer_calibrated"] == pytest.approx(
        report["oracle_chamfer"])


def test_calibrate_degenerates_to_pure_modes():
    margin = np.linspace(-1, 1, 32)
    always_rl = gate_lib.calibrate_gate(
        {"cd_rl": np.full(32, 0.01), "cd_ae": np.full(32, 0.05),
         "margin": margin})
    assert always_rl["gate_mode"] == "rl"
    always_ae = gate_lib.calibrate_gate(
        {"cd_rl": np.full(32, 0.05), "cd_ae": np.full(32, 0.01),
         "margin": margin})
    assert always_ae["gate_mode"] == "ae"


def test_calibrate_never_worse_than_raw_gate_or_pure_modes():
    rng = np.random.RandomState(0)
    stats = {"cd_rl": rng.rand(200) * 0.1, "cd_ae": rng.rand(200) * 0.1,
             "margin": rng.randn(200)}
    report = gate_lib.calibrate_gate(stats)
    best = report["val_chamfer_calibrated"]
    assert best <= report["val_chamfer_raw_gate"] + 1e-12
    assert best <= report["val_chamfer_rl"] + 1e-12
    assert best <= report["val_chamfer_ae"] + 1e-12


def test_gate_sidecar_roundtrip(tmp_path):
    report = {"gate_mode": "discriminator", "gate_bias": 1.25,
              "val_chamfer_calibrated": 0.02}
    gate_lib.save_gate_calibration(str(tmp_path), report)
    mode, bias = gate_lib.load_gate_calibration(str(tmp_path))
    assert (mode, bias) == ("discriminator", 1.25)
    # missing sidecar -> defaults
    mode, bias = gate_lib.load_gate_calibration(
        str(tmp_path / "nope"), default_mode="rl", default_bias=0.5)
    assert (mode, bias) == ("rl", 0.5)
    # corrupt sidecar -> defaults, no crash
    (tmp_path / gate_lib.GATE_FILE).write_text("{not json")
    mode, bias = gate_lib.load_gate_calibration(str(tmp_path))
    assert (mode, bias) == ("discriminator", 0.0)


# ---------------------------------------------------------------------------
# gate_bias routing in complete() and complete_fast()
# ---------------------------------------------------------------------------


def test_gate_bias_shifts_routing():
    """With bias -> -inf every sample routes to the GAN path; +inf to the
    AE path; both completion paths must agree on the semantics."""
    config = Config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    td3 = config.td3_config()
    pc = jax.random.normal(jax.random.PRNGKey(1), (4, 2048, 3))

    lo = net.complete(model, pc, cfg=td3, gate_bias=-1e9)
    hi = net.complete(model, pc, cfg=td3, gate_bias=1e9)
    np.testing.assert_allclose(np.asarray(lo["hybrid_output"]),
                               np.asarray(lo["completed_pc"]))
    np.testing.assert_allclose(np.asarray(hi["hybrid_output"]),
                               np.asarray(hi["ae_reconstruction"]))

    engine = inference.prepare_inference_engine(model)
    lo_f = inference.complete_fast(engine, pc, gate_bias=-1e9)
    hi_f = inference.complete_fast(engine, pc, gate_bias=1e9)
    np.testing.assert_allclose(np.asarray(lo_f["hybrid_output"]),
                               np.asarray(lo_f["completed_pc"]))
    np.testing.assert_allclose(np.asarray(hi_f["hybrid_output"]),
                               np.asarray(hi_f["ae_reconstruction"]))


def test_gate_stats_step_consistent_with_complete():
    config = Config()
    model = net.init_model(jax.random.PRNGKey(3), config)
    td3 = config.td3_config()
    batch = {"complete_pc": jax.random.normal(jax.random.PRNGKey(4),
                                              (4, 2048, 3)),
             "pad": jnp.zeros((4,))}
    m = gate_lib.gate_stats_step(model, batch, jax.random.PRNGKey(5),
                                 cfg=td3)
    assert m["cd_rl"].shape == (4,)
    assert m["cd_ae"].shape == (4,)
    assert m["margin"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(m["cd_rl"])))
    assert np.all(np.isfinite(np.asarray(m["margin"])))


# ---------------------------------------------------------------------------
# w_ae_recon joint loss + lgan_d_refresh + trainer phase 5.5
# ---------------------------------------------------------------------------


def test_joint_step_w_ae_recon_trains_ae_path():
    """The AE-preserving term must change the update (and keep the step
    finite); with w=0 the step must match the original formulation."""
    config = Config()
    model = net.init_model(jax.random.PRNGKey(6), config)
    td3 = config.td3_config()
    opt = steps.make_joint_optimizer(config.training.joint)
    opt_state = opt.init({"ae": model["ae"]["params"],
                          "gen": model["lgan"]["params"]["generator"]})
    batch = {"complete_pc": jax.random.normal(jax.random.PRNGKey(7),
                                              (4, 2048, 3)),
             "pad": jnp.zeros((4,))}
    key = jax.random.PRNGKey(8)
    m0_model, _, m0 = steps.joint_train_step(model, opt_state, batch, key,
                                             optimizer=opt, cfg=td3)
    m1_model, _, m1 = steps.joint_train_step(model, opt_state, batch, key,
                                             optimizer=opt, cfg=td3,
                                             w_ae_recon=1.0)
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    # same data, same key: the chamfer/gfv components are measured on the
    # same forward, so only the parameter update differs
    w0 = np.asarray(
        m0_model["ae"]["params"]["decoder"]["mlp"][0]["dense"]["w"])
    w1 = np.asarray(
        m1_model["ae"]["params"]["decoder"]["mlp"][0]["dense"]["w"])
    assert not np.allclose(w0, w1)


def test_lgan_d_refresh_updates_discriminator_only():
    config = Config()
    model = net.init_model(jax.random.PRNGKey(9), config)
    lgan_cfg = config.training.lgan
    d_opt = steps.make_gan_optimizer(lgan_cfg.discriminator_lr, lgan_cfg)
    d_opt_state = d_opt.init(model["lgan"]["params"]["discriminator"])
    real = jax.random.normal(jax.random.PRNGKey(10), (3, 8, 128))
    new_p, new_s, _, m = steps.lgan_d_refresh(
        model["lgan"]["params"], model["lgan"]["state"], d_opt_state, real,
        jax.random.PRNGKey(11), d_opt=d_opt, lambda_gp=lgan_cfg.lambda_gp,
        z_dim=config.model.lgan.z_dim)
    assert m["d_losses"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(m["d_losses"])))
    # generator untouched, discriminator moved
    g0 = model["lgan"]["params"]["generator"]["mlp"][0]["dense"]["w"]
    g1 = new_p["generator"]["mlp"][0]["dense"]["w"]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    d0 = model["lgan"]["params"]["discriminator"]["layers"][0]["dense"]["w"]
    d1 = new_p["discriminator"]["layers"][0]["dense"]["w"]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


N_POINTS = 256


@pytest.fixture(scope="module")
def gate_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("gate_e2e")
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
            "autoencoder": {"epochs": 1, "batch_size": 8,
                            "scheduler_step": 1},
            "lgan": {"epochs": 1, "batch_size": 8, "d_steps": 1},
            "rl_agent": {"episodes": 8, "envs_per_step": 8,
                         "start_training_steps": 8},
            "joint": {"enabled": True, "epochs": 1, "w_ae_recon": 1.0,
                      "refresh_d_steps": 4, "calibrate_gate": True},
        },
        "data": {"data_dir": str(data_dir)},
    })


def test_pipeline_with_refresh_and_calibration(gate_config):
    """Full pipeline with phase 5.5 enabled: the refresh runs, the
    calibration sidecar lands next to the checkpoints with a mode the
    serving paths accept, and joint_calibrated/final checkpoints exist."""
    trainer = RLGANNetTrainer(gate_config, use_orbax=False)
    trainer.train_full_pipeline()
    ckpt_dir = trainer.checkpoint_dir
    sidecar = ckpt_dir / gate_lib.GATE_FILE
    assert sidecar.exists()
    report = json.loads(sidecar.read_text())
    assert report["gate_mode"] in ("discriminator", "rl", "ae")
    assert report["val_chamfer_calibrated"] <= report["val_chamfer_rl"] + 1e-12
    assert report["val_chamfer_calibrated"] <= report["val_chamfer_ae"] + 1e-12
    assert (ckpt_dir / "joint_calibrated").exists()
    assert (ckpt_dir / "final").exists()

    mode, bias = gate_lib.load_gate_calibration(str(ckpt_dir))
    pc = jax.random.normal(jax.random.PRNGKey(12), (2, N_POINTS, 3))
    out = net.complete(trainer.model, pc, cfg=trainer.td3,
                       gate_mode=mode, gate_bias=bias)
    assert np.all(np.isfinite(np.asarray(out["hybrid_output"])))
    trainer.close()


def test_gate_sidecar_scoped_to_calibrated_checkpoints(tmp_path):
    """The calibration is measured against the phase-5.5 refreshed D, so a
    sidecar recording its checkpoints must NOT apply to other checkpoints
    from the same directory (joint_best still has the stale D)."""
    report = {"gate_mode": "ae", "gate_bias": 0.0,
              "checkpoints": ["joint_calibrated", "final"]}
    gate_lib.save_gate_calibration(str(tmp_path), report)
    # matching checkpoint -> calibrated values
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="joint_calibrated") == ("ae", 0.0)
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="final") == ("ae", 0.0)
    # a different checkpoint in the same dir -> config defaults
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="joint_best",
        default_mode="discriminator", default_bias=0.25) == \
        ("discriminator", 0.25)
    # unknown source (engine serving) and legacy sidecars keep applying
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint=None) == ("ae", 0.0)
    legacy = {"gate_mode": "rl", "gate_bias": 1.0}
    gate_lib.save_gate_calibration(str(tmp_path), legacy)
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="anything") == ("rl", 1.0)


def test_calibrate_gate_rejects_empty_stats():
    """An all-padded split must fail with a clear message, not an
    IndexError deep in the threshold sweep."""
    empty = {k: np.zeros((0,), np.float32)
             for k in ("cd_rl", "cd_ae", "margin")}
    with pytest.raises(ValueError, match="no validation samples"):
        gate_lib.calibrate_gate(empty)


def test_descope_gate_calibration(tmp_path):
    """Overwriting a scoped checkpoint without a fresh calibration must
    remove it from the sidecar's scope — and delete the sidecar once the
    scope empties — so a stale bias never applies against a different
    discriminator (advisor r3)."""
    report = {"gate_mode": "ae", "gate_bias": 0.5,
              "checkpoints": ["joint_calibrated", "final"]}
    gate_lib.save_gate_calibration(str(tmp_path), report)

    gate_lib.descope_gate_calibration(str(tmp_path), "final")
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="final",
        default_mode="discriminator", default_bias=0.0) == \
        ("discriminator", 0.0)
    # the other scoped checkpoint still applies
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="joint_calibrated") == ("ae", 0.5)

    gate_lib.descope_gate_calibration(str(tmp_path), "joint_calibrated")
    assert not (tmp_path / gate_lib.GATE_FILE).exists()

    # no-ops: missing sidecar, unscoped name, legacy sidecar
    gate_lib.descope_gate_calibration(str(tmp_path), "final")
    gate_lib.save_gate_calibration(str(tmp_path), {"gate_mode": "rl",
                                                   "gate_bias": 1.0})
    gate_lib.descope_gate_calibration(str(tmp_path), "final")
    assert gate_lib.load_gate_calibration(
        str(tmp_path), checkpoint="final") == ("rl", 1.0)
