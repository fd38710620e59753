"""Typed configuration, YAML-compatible with the reference's configs.

The reference loads YAML into a raw dict and hand-casts strings
(train_rl_gan_net.py:42-43,72-101); many knobs are silently dead (d_steps,
lambda_gp, the RL noise parameters, max_steps_per_episode — SURVEY.md §5).
Here the same YAML schema parses into frozen dataclasses, *every* knob is
wired into the pipeline, and unknown keys produce a warning instead of
silently doing nothing.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml

from gan_rl_3d_tpu.models.rl_agent import TD3Config

log = logging.getLogger(__name__)


def _tuple(x) -> Tuple:
    return tuple(x) if isinstance(x, (list, tuple)) else (x,)


@dataclass(frozen=True)
class AutoencoderModelConfig:
    input_dim: int = 3
    latent_dim: int = 128
    num_points: int = 2048
    encoder_dims: Tuple[int, ...] = (64, 128, 128, 256, 128)
    decoder_dims: Tuple[int, ...] = (256, 256, 6144)
    # architecture variants: "pointnet" | "attention", "mlp" | "adaptive"
    # (reference's alternates, models/variants.py)
    encoder_type: str = "pointnet"
    decoder_type: str = "mlp"


@dataclass(frozen=True)
class LGANModelConfig:
    z_dim: int = 1
    latent_dim: int = 128
    generator_dims: Tuple[int, ...] = (256, 512, 512, 256, 128)
    discriminator_dims: Tuple[int, ...] = (128, 256, 512, 256, 1)
    spectral_norm: bool = True


@dataclass(frozen=True)
class RLAgentModelConfig:
    state_dim: int = 128
    action_dim: int = 1
    hidden_dims: Tuple[int, ...] = (400, 400, 300, 300)
    actor_lr: float = 1e-4
    critic_lr: float = 1e-3
    tau: float = 0.005
    gamma: float = 0.99
    buffer_size: int = 100000
    batch_size: int = 64


@dataclass(frozen=True)
class AETrainConfig:
    epochs: int = 100
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1e-5
    scheduler_step: int = 30
    scheduler_gamma: float = 0.1
    # LR schedule shape: "step" = torch StepLR parity (reference
    # train_rl_gan_net.py:186-188); "cosine" = cosine decay over the full
    # phase (runs/ae_frontier ladder — probes past the 120-epoch recipe)
    lr_schedule: str = "step"
    # 3-stage easy->target hole curriculum: stage s of 3 trains with hole
    # bounds scaled by (s+1)/3 of the configured data.hole_*_ratio range
    # (validation always uses the full target bounds). Off by default —
    # the reference trains at fixed 0.2-0.5 (utils/dataset.py:252-258).
    hole_curriculum: bool = False

    def __post_init__(self):
        if self.lr_schedule not in ("step", "cosine"):
            raise ValueError(
                f"autoencoder.lr_schedule must be 'step' or 'cosine', "
                f"got {self.lr_schedule!r}")


@dataclass(frozen=True)
class LGANTrainConfig:
    epochs: int = 200
    batch_size: int = 50
    generator_lr: float = 1e-4
    discriminator_lr: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.9
    lambda_gp: float = 10.0
    d_steps: int = 5


@dataclass(frozen=True)
class RLTrainConfig:
    episodes: int = 1000
    max_steps_per_episode: int = 10
    exploration_noise: float = 0.1
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    policy_delay: int = 2
    # TPU addition: critic-warmup — actor updates are skipped for the
    # first N TD3 updates (see models.rl_agent.TD3Config.actor_warmup)
    actor_warmup: int = 0
    # TPU addition: warmup-then-ramp — after the warmup gate opens, the
    # actor lr ramps linearly to actor_lr over this many applied policy
    # updates (TD3Config.actor_lr_ramp; 0 = constant lr)
    actor_lr_ramp: int = 0
    start_training_steps: int = 1000
    # TPU additions: parallel environment instances per device program, env
    # steps per episode (capped by max_steps_per_episode; 1 = reference
    # behaviour), and TD3 updates per iteration
    envs_per_step: int = 32
    steps_per_episode: int = 1
    updates_per_step: int = 1


@dataclass(frozen=True)
class JointTrainConfig:
    enabled: bool = True
    epochs: int = 50
    lr: float = 1e-4
    weight_decay: float = 1e-5
    # TPU additions fixing the reference design's phase-5 regression (its
    # joint loss trains only the GAN path, so the AE path — and with it the
    # hybrid gate's fallback — degrades; runs/best/RESULTS.md):
    # * w_ae_recon adds w * chamfer(decode(noisy_gfv), complete) to the
    #   joint loss so the AE path keeps improving too (0.0 = reference
    #   behaviour, train_rl_gan_net.py:493-522)
    # * refresh_d_steps > 0 retrains the discriminator (WGAN-GP, G frozen)
    #   on re-extracted post-joint GFVs so the hybrid gate scores the
    #   distribution it actually sees
    # * calibrate_gate sweeps the gate threshold on the val split and
    #   writes gate_calibration.json next to the checkpoints
    w_ae_recon: float = 0.0
    refresh_d_steps: int = 0
    calibrate_gate: bool = False
    # * freeze_generator keeps G exactly as phase 3 left it (params AND
    #   norm state; its forward runs in eval mode) while the joint loss
    #   fine-tunes encoder/decoder around it. Motivation: joint fine-tuning
    #   shifts G under the trained agent and degrades the per-sample
    #   oracle itself (z8 study: 0.0255 -> 0.0338, runs/zdim/RESULTS.md
    #   section 8) — the same pathology refresh_d_steps fixes for D.
    freeze_generator: bool = False
    # * preserve_gan_path snapshots the (generator, decoder) pair at the
    #   start of phase 5 and routes the SERVING GAN branch through the
    #   snapshot (models.rl_gan_net.gan_generate/gan_decode) while joint
    #   fine-tuning improves the live AE path. Motivation: the z8 study
    #   measured that the GAN path's own oracle degrades through joint
    #   REGARDLESS of freeze_generator (unfrozen: G shifts under the
    #   trained agent; frozen: the decoder shifts instead — sampled
    #   oracle 0.0233 -> ~0.032 either way, runs/best5/RESULTS.md). The
    #   snapshot keeps the exact stack phase 4 trained the agent against,
    #   so the hybrid gate chooses between the best-available AE path and
    #   the best-available GAN path instead of two halves of a
    #   compromised one. Phase 5.5's D refresh draws its fakes from the
    #   snapshot generator so the gate's critic scores the serving stack.
    preserve_gan_path: bool = False


@dataclass(frozen=True)
class TrainingConfig:
    device: str = "tpu"
    # Mixed-precision policy for the heavy train steps:
    #   "float32"        — everything f32 (quality default on this model)
    #   "bfloat16"/"bf16" — bf16 matmuls/activations, f32 master weights +
    #                       BN stats + loss
    #   "bf16_selective" — bf16 everywhere except the decoder's final
    #                       coordinate head AND the encoder's final
    #                       (GFV-bottleneck) layer, both f32. Measured at
    #                       f32 quality (0.0238 vs 0.0244 val chamfer at
    #                       equal epochs) with ~1.4x the f32 step speed —
    #                       the GFV layer was where bf16 rounding hurt
    #                       (runs/bf16/RESULTS.md, docs/PERF.md reject #6)
    precision: str = "float32"
    # Training-mode BatchNorm statistics (nn.batchnorm_apply):
    #   "single_read_grouped" — both moments in ONE read of the
    #                           activation with a shard-aligned grouped
    #                           reduction: measured 8.4% faster AE step
    #                           (207 -> 191 ms at B=1024) and MORE
    #                           partition-invariant than centered
    #                           (benchmarks/bn_stats_probe.py), so it is
    #                           the default — docs/PERF.md #7
    #   "centered"            — two-pass E[(x-mean)^2] escape hatch;
    #                           required if a data mesh has >8 shards
    #                           (group/shard alignment — see nn.py)
    bn_stats: str = "single_read_grouped"
    # Placement of the device-resident train split during the scanned AE
    # and joint epochs (train/trainer.py):
    #   "replicated" — full split on every device (default; ~25 KB/cloud,
    #                  so 12.8k clouds is ~315 MB/device — fine in 16 GB
    #                  HBM). Any batch plan is a device-local gather.
    #   "sharded"    — split row-sharded along the "data" mesh axis
    #                  (1/n_data of the split per device) with a
    #                  shard-ALIGNED shuffle: batch slot group g draws
    #                  only rows from resident group g (fixed 8 groups,
    #                  mirroring bn_stats single_read_grouped), so every
    #                  gather stays device-local and the trajectory is
    #                  identical on every mesh whose data axis divides 8.
    #                  Use when the split stops fitting replicated
    #                  (docs/SCALING.md "Resident-dataset memory model").
    data_residency: str = "replicated"
    seed: int = 42
    batch_size: int = 32
    num_workers: int = 4
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    results_dir: str = "./results"
    autoencoder: AETrainConfig = field(default_factory=AETrainConfig)
    lgan: LGANTrainConfig = field(default_factory=LGANTrainConfig)
    rl_agent: RLTrainConfig = field(default_factory=RLTrainConfig)
    joint: JointTrainConfig = field(default_factory=JointTrainConfig)

    def __post_init__(self):
        if self.precision not in ("float32", "f32", "bfloat16", "bf16",
                                  "bf16_selective"):
            raise ValueError(
                f"training.precision must be one of float32/bfloat16/"
                f"bf16_selective, got {self.precision!r}")
        if self.bn_stats not in ("centered", "single_read_grouped"):
            raise ValueError(
                f"training.bn_stats must be 'centered' or "
                f"'single_read_grouped', got {self.bn_stats!r}")
        if self.data_residency not in ("replicated", "sharded"):
            raise ValueError(
                f"training.data_residency must be 'replicated' or "
                f"'sharded', got {self.data_residency!r}")


@dataclass(frozen=True)
class LossConfig:
    w_chamfer: float = 100.0
    w_gfv: float = 10.0
    w_discriminator: float = 0.01
    # "bidirectional" | "forward": reference config.yaml:87 parses this and
    # ChamferLoss ignores it (always bidirectional); here it is wired
    chamfer_loss: str = "bidirectional"
    # "chamfer" | "mse": reference config.yaml:88 says "mse" while
    # train_autoencoder_epoch uses Chamfer unconditionally
    # (train_rl_gan_net.py:236); here it is wired, defaulting to the
    # reference's *actual* behaviour
    reconstruction_loss: str = "chamfer"

    def __post_init__(self):
        if self.chamfer_loss not in ("bidirectional", "forward",
                                     "unidirectional"):
            raise ValueError(
                f"loss.chamfer_loss must be 'bidirectional' or 'forward', "
                f"got {self.chamfer_loss!r}")
        if self.reconstruction_loss not in ("chamfer", "mse"):
            raise ValueError(
                f"loss.reconstruction_loss must be 'chamfer' or 'mse', "
                f"got {self.reconstruction_loss!r}")

    @property
    def bidirectional(self) -> bool:
        return self.chamfer_loss == "bidirectional"


@dataclass(frozen=True)
class AugmentationConfig:
    rotation: bool = True
    jitter: bool = True
    scale: bool = True


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "./data/shapenet"
    train_split: float = 0.8
    val_split: float = 0.1
    test_split: float = 0.1
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    normalize: bool = True
    center: bool = True
    unit_sphere: bool = True
    # removed-fraction bounds for on-device hole cutting (the reference
    # hardcodes 0.2-0.5, utils/dataset.py:252-258; exposed here)
    hole_min_ratio: float = 0.2
    hole_max_ratio: float = 0.5


@dataclass(frozen=True)
class EvaluationConfig:
    metrics: Tuple[str, ...] = ("chamfer_distance", "completion_ratio",
                                "hausdorff_distance")
    save_visualizations: bool = True
    eval_frequency: int = 10
    fscore_threshold: float = 0.01
    # reported alongside the primary threshold so the F-score row is
    # interpretable (one number at one arbitrary tau on unit-sphere clouds
    # invites misreading; reference README.md:304-305 quotes a single
    # protocol-less 0.863)
    fscore_thresholds: Tuple[float, ...] = (0.01, 0.02, 0.05)
    completion_threshold: float = 0.03


@dataclass(frozen=True)
class LoggingConfig:
    use_tensorboard: bool = True
    use_wandb: bool = False
    project_name: str = "RL-GAN-Net"
    log_frequency: int = 100
    save_model_frequency: int = 10


@dataclass(frozen=True)
class ModelConfig:
    autoencoder: AutoencoderModelConfig = field(
        default_factory=AutoencoderModelConfig)
    lgan: LGANModelConfig = field(default_factory=LGANModelConfig)
    rl_agent: RLAgentModelConfig = field(default_factory=RLAgentModelConfig)
    # Which output complete() returns as hybrid_output (TPU addition):
    #   "discriminator" — the reference's per-sample D-score gate
    #     (rl_gan_net.py:162-171). Kept as the parity default, but measured
    #     to misroute after joint fine-tuning (headtohead/RESULTS.md: 0.0637
    #     vs 0.0463 for the plain RL path on held-out data).
    #   "rl" — always the RL/GAN path (decode(G(z_rl))).
    #   "ae" — always the plain AE reconstruction.
    #   "union" — per-point fusion: both paths' points concatenated,
    #     (B, 2N, 3) at DOUBLE the output budget. Beats pure AE by ~7%
    #     on the best7 flagship (runs/best7/RESULTS.md) but loses when
    #     the GAN path lags (runs/best6 fusion study) — explicit opt-in,
    #     never calibration-selected.
    gate_mode: str = "discriminator"
    # D-gate decision threshold: GAN path chosen when D(clean) > D(noisy)
    # + gate_bias. 0.0 = the reference's raw comparison; the trainer's
    # post-joint gate calibration (train.gate.calibrate_gate) writes the
    # val-chamfer-minimising value into checkpoints/gate_calibration.json,
    # which evaluate.py / complete_clouds.py prefer over this knob.
    gate_bias: float = 0.0

    def __post_init__(self):
        if self.gate_mode not in ("discriminator", "rl", "ae", "union"):
            raise ValueError(
                f"model.gate_mode must be 'discriminator', 'rl', 'ae' or "
                f"'union', got {self.gate_mode!r}")


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)

    def td3_config(self) -> TD3Config:
        """Wire model.rl_agent + training.rl_agent into the TD3 step config.

        The reference constructs DDPGAgent without passing the training.*
        noise knobs (rl_gan_net.py:77-89), silently using constructor
        defaults; here they are honoured.
        """
        m, t = self.model.rl_agent, self.training.rl_agent
        return TD3Config(
            state_dim=m.state_dim,
            action_dim=m.action_dim,
            actor_hidden=m.hidden_dims,
            critic_hidden=m.hidden_dims,
            actor_lr=m.actor_lr,
            critic_lr=m.critic_lr,
            gamma=m.gamma,
            tau=m.tau,
            batch_size=m.batch_size,
            exploration_noise=t.exploration_noise,
            policy_noise=t.policy_noise,
            noise_clip=t.noise_clip,
            policy_delay=t.policy_delay,
            actor_warmup=t.actor_warmup,
            actor_lr_ramp=t.actor_lr_ramp,
        )

    def preproc_spec(self):
        """Wire data.{augmentation.*,normalize,center,unit_sphere,
        hole_*_ratio} into one static PreprocSpec for the jitted steps."""
        from gan_rl_3d_tpu.ops.pointcloud import PreprocSpec

        d = self.data
        return PreprocSpec(
            rotation=d.augmentation.rotation,
            jitter=d.augmentation.jitter,
            scale=d.augmentation.scale,
            normalize=d.normalize,
            center=d.center,
            unit_sphere=d.unit_sphere,
            hole_min=d.hole_min_ratio,
            hole_max=d.hole_max_ratio,
        )


_TUPLE_FIELDS = {"encoder_dims", "decoder_dims", "generator_dims",
                 "discriminator_dims", "hidden_dims", "metrics"}


def _build(cls, raw: Dict[str, Any], path: str = ""):
    """Recursively build a dataclass from a raw dict, coercing numeric
    strings (YAML '1e-4' parses as str) and warning on unknown keys."""
    if raw is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            if key not in ("paths",):  # reference 'paths' block is redundant
                log.warning("config: ignoring unknown key %s%s", path, key)
            continue
        f = fields[key]
        # with `from __future__ import annotations` field types are strings
        sub_cls = globals().get(f.type) if isinstance(f.type, str) else f.type
        if key in _TUPLE_FIELDS:
            kwargs[key] = _tuple(value)
        elif dataclasses.is_dataclass(sub_cls):
            kwargs[key] = _build(sub_cls, value, path=f"{path}{key}.")
        elif f.type in (float, "float"):
            kwargs[key] = float(value)
        elif f.type in (bool, "bool"):
            kwargs[key] = bool(value)
        elif f.type in (int, "int"):
            kwargs[key] = int(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a reference-schema YAML into a typed Config."""
    raw: Dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        raw = _deep_merge(raw, overrides)
    c = _build(Config, raw)
    if c.model.rl_agent.action_dim != c.model.lgan.z_dim:
        # the actor's output IS the generator's z input — a mismatch only
        # surfaces as a shape error deep inside the composite model
        raise ValueError(
            f"model.rl_agent.action_dim ({c.model.rl_agent.action_dim}) "
            f"must equal model.lgan.z_dim ({c.model.lgan.z_dim}); set both "
            "when changing the latent action space")
    return c


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
