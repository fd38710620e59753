"""RL-GAN-Net composite: autoencoder + latent GAN + TD3 agent.

Capability parity with reference models/rl_gan_net.py:33-339 (RLGANNet and
RLGANNetEnvironment), redesigned TPU-first:

* ``complete()`` is a single pure function — encoder -> actor -> generator
  -> decoder -> discriminator-gated hybrid output — that jits into one
  program; the reference loops Python per sample inside select_z_vector
  (rl_gan_net.py:121-126), its biggest inference inefficiency.
* The RL environment is batched: reset/step process (B, ...) arrays through
  the same jitted model functions; the reference env steps one sample at a
  time *and* crashes as wired (batch-key mismatch between trainer and env,
  train_rl_gan_net.py:393-396 vs rl_gan_net.py:293 — documented bug we fix).
* Phase freezing is expressed by which params a phase's train step
  differentiates — there is no requires_grad state to mutate.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

if TYPE_CHECKING:  # avoid a config <-> models import cycle at runtime
    from gan_rl_3d_tpu.config import Config

from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import latent_gan as lg
from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.ops import losses as losses_ops

Array = jax.Array

PHASES = ("autoencoder", "lgan", "rl_agent", "joint")


def init_model(key, config: "Config") -> dict:
    """Build the full model bundle (reference RLGANNet.__init__,
    rl_gan_net.py:38-51)."""
    k_ae, k_lgan, k_agent = jax.random.split(key, 3)
    mc = config.model
    ae_p, ae_s = ae.autoencoder_init(
        k_ae, mc.autoencoder.input_dim, mc.autoencoder.latent_dim,
        mc.autoencoder.num_points, mc.autoencoder.encoder_dims,
        mc.autoencoder.decoder_dims,
        encoder_type=mc.autoencoder.encoder_type,
        decoder_type=mc.autoencoder.decoder_type)
    lgan_p, lgan_s = lg.lgan_init(
        k_lgan, mc.lgan.z_dim, mc.lgan.latent_dim, mc.lgan.generator_dims,
        mc.lgan.discriminator_dims, spectral_norm=mc.lgan.spectral_norm)
    agent = rl.agent_init(k_agent, config.td3_config())
    return {
        "ae": {"params": ae_p, "state": ae_s},
        "lgan": {"params": lgan_p, "state": lgan_s},
        "agent": agent,
    }


# ---------------------------------------------------------------------------
# Component accessors (reference encode_point_cloud / decode_gfv /
# generate_clean_gfv, rl_gan_net.py:100-110) — all eval-mode, stateless
# ---------------------------------------------------------------------------


def encode(model: dict, pc: Array, mask: Optional[Array] = None) -> Array:
    gfv, _ = ae.any_encoder_apply(model["ae"]["params"]["encoder"],
                                  model["ae"]["state"]["encoder"], pc, mask,
                                  training=False)
    return gfv


def decode(model: dict, gfv: Array) -> Array:
    pc, _ = ae.any_decoder_apply(model["ae"]["params"]["decoder"],
                                 model["ae"]["state"]["decoder"], gfv,
                                 training=False)
    return pc


def generate(model: dict, z: Array) -> Array:
    gfv, _ = lg.lgan_generate(model["lgan"]["params"], model["lgan"]["state"],
                              z, training=False)
    return gfv


# The SERVING GAN branch. When phase 5 ran with joint.preserve_gan_path the
# model carries a ``gan_path`` snapshot — the generator and decoder exactly
# as phase 4 trained the agent against them — and the serving GAN branch
# routes through it. Rationale (measured, runs/zdim/RESULTS.md §8 and
# runs/best5/RESULTS.md): joint fine-tuning degrades the GAN path's own
# per-sample oracle (0.0255 -> 0.0338 at z8) whether G is frozen (the
# decoder shifts instead) or not (G shifts under the trained agent). The
# snapshot removes the pathology outright instead of choosing which half of
# the stack drifts; the AE path still gets the full benefit of joint
# fine-tuning. The reference has no counterpart — its phase 5 serves the
# shifted stack (reference train_rl_gan_net.py:493-522).


def gan_generate(model: dict, z: Array) -> Array:
    """Generator of the serving GAN branch: the ``gan_path`` snapshot when
    present, else the live LGAN generator."""
    snap = model.get("gan_path")
    if snap is not None:
        gfv, _ = lg.generator_apply(snap["generator"]["params"],
                                    snap["generator"]["state"], z,
                                    training=False)
        return gfv
    return generate(model, z)


def gan_decode(model: dict, gfv: Array) -> Array:
    """Decoder of the serving GAN branch (snapshot-preferring twin of
    :func:`decode`)."""
    snap = model.get("gan_path")
    if snap is not None:
        pc, _ = ae.any_decoder_apply(snap["decoder"]["params"],
                                     snap["decoder"]["state"], gfv,
                                     training=False)
        return pc
    return decode(model, gfv)


def discriminate(model: dict, gfv: Array) -> Array:
    score, _ = lg.lgan_discriminate(model["lgan"]["params"],
                                    model["lgan"]["state"], gfv,
                                    training=False)
    return score


def select_z(model: dict, noisy_gfv: Array, cfg: rl.TD3Config,
             *, key: Optional[Array] = None,
             ou_state: Optional[Array] = None,
             add_noise: bool = False) -> Array:
    """Batched z-vector selection (replaces the reference's per-sample
    Python loop, rl_gan_net.py:112-126). The reference adds OU exploration
    noise even at inference (:123); here that's opt-in."""
    z, _ = rl.select_action(model["agent"], noisy_gfv, cfg, key=key,
                            ou_state=ou_state, add_noise=add_noise)
    return z


# ---------------------------------------------------------------------------
# Full completion path (reference forward(mode="inference"),
# rl_gan_net.py:128-171) — the benchmark kernel
# ---------------------------------------------------------------------------


def complete(
    model: dict,
    pc: Array,
    mask: Optional[Array] = None,
    *,
    cfg: rl.TD3Config = rl.TD3Config(),
    key: Optional[Array] = None,
    ou_state: Optional[Array] = None,
    add_noise: bool = False,
    hybrid: bool = True,
    gate_mode: str = "discriminator",
    gate_bias: float = 0.0,
) -> Dict[str, Array]:
    """Incomplete cloud (B, N, 3) -> completed cloud + all intermediates.

    Pipeline: encode -> actor z -> generator clean GFV -> decode, plus the
    plain AE reconstruction; with ``hybrid`` a per-sample choice between the
    two outputs lands in ``hybrid_output``. ``gate_mode`` picks the policy
    (config: model.gate_mode): "discriminator" is the reference's D-score
    gate (rl_gan_net.py:162-171); "rl"/"ae" trust one path outright —
    measured on held-out data the D-gate misroutes after joint fine-tuning
    (headtohead/RESULTS.md), so "rl" is the quality pick.

    ``gate_bias`` shifts the D-gate's decision boundary: the GAN path is
    chosen when D(clean) > D(noisy) + bias. Calibrated on the val split by
    train.gate.calibrate_gate after the discriminator refresh; 0.0 is the
    reference's raw comparison.

    ``gate_mode="union"`` is per-POINT fusion: ``hybrid_output`` is the
    concatenation of both paths' points — (B, 2N, 3), DOUBLE the output
    budget. Measured on the best7 flagship (runs/best7/RESULTS.md) the
    union beats pure AE by ~7% test chamfer (0.0211 vs 0.0227) because
    the joint-repaired GAN path covers complementary regions; on stacks
    whose GAN path lags badly it LOSES (runs/best6 fusion study), so it
    is an explicit serving choice, never calibration-selected.
    """
    if gate_mode not in ("discriminator", "rl", "ae", "union"):
        raise ValueError(f"invalid gate_mode {gate_mode!r}")
    noisy_gfv = encode(model, pc, mask)
    z = select_z(model, noisy_gfv, cfg, key=key, ou_state=ou_state,
                 add_noise=add_noise)
    # GAN branch through the serving stack (the ``gan_path`` snapshot when
    # phase 5 preserved it); AE branch always through the live decoder.
    clean_gfv = gan_generate(model, z)
    completed = gan_decode(model, clean_gfv)
    ae_recon = decode(model, noisy_gfv)
    results = {
        "noisy_gfv": noisy_gfv,
        "z_vector": z,
        "clean_gfv": clean_gfv,
        "completed_pc": completed,
        "ae_reconstruction": ae_recon,
    }
    if hybrid:
        if gate_mode == "rl":
            results["hybrid_output"] = completed
        elif gate_mode == "ae":
            results["hybrid_output"] = ae_recon
        elif gate_mode == "union":
            results["hybrid_output"] = jnp.concatenate(
                [completed, ae_recon], axis=1)
        else:  # "discriminator"
            rl_score = discriminate(model, clean_gfv)
            ae_score = discriminate(model, noisy_gfv)
            better = (rl_score > ae_score + gate_bias).astype(
                completed.dtype)[..., None]
            results["hybrid_output"] = (better * completed
                                        + (1.0 - better) * ae_recon)
            results["rl_gan_score"] = rl_score
            results["ae_score"] = ae_score
    return results


def forward(
    model: dict,
    pc: Array,
    *,
    phase: str = "autoencoder",
    mode: str = "inference",
    mask: Optional[Array] = None,
    cfg: rl.TD3Config = rl.TD3Config(),
    key: Optional[Array] = None,
    z_dim: int = 1,
) -> Dict[str, Array]:
    """Phase-gated forward mirroring reference RLGANNet.forward
    (rl_gan_net.py:128-191). Eval-mode; training phases use the dedicated
    jitted steps in gan_rl_3d_tpu.train."""
    if phase not in PHASES:
        raise ValueError(f"invalid phase {phase!r}; must be one of {PHASES}")
    if mode == "inference" or phase in ("rl_agent", "joint"):
        return complete(model, pc, mask, cfg=cfg, key=key,
                        hybrid=(mode == "inference"))
    noisy_gfv = encode(model, pc, mask)
    results = {"noisy_gfv": noisy_gfv}
    if phase == "autoencoder":
        results["ae_reconstruction"] = decode(model, noisy_gfv)
    elif phase == "lgan":
        assert key is not None, "lgan-phase forward needs a PRNG key"
        z = jax.random.normal(key, (pc.shape[0], z_dim))
        results["z_vector"] = z
        results["clean_gfv"] = generate(model, z)
        results["completed_pc"] = decode(model, results["clean_gfv"])
    return results


def compute_reward(
    model: dict,
    pred_pc: Array,
    target_pc: Array,
    pred_gfv: Array,
    target_gfv: Array,
    *,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
) -> Array:
    """Per-sample rewards (reference compute_reward, rl_gan_net.py:193-204,
    batched)."""
    d_out = discriminate(model, pred_gfv)
    return losses_ops.completion_reward_batched(
        pred_pc, target_pc, pred_gfv, target_gfv, d_out,
        w_chamfer=w_chamfer, w_gfv=w_gfv, w_discriminator=w_discriminator)


# ---------------------------------------------------------------------------
# Batched RL environment (reference RLGANNetEnvironment,
# rl_gan_net.py:267-339 — fixed + vectorised)
# ---------------------------------------------------------------------------


class EnvState(NamedTuple):
    """Carries everything step() needs; all arrays batched (B, ...)."""

    state: Array        # noisy GFVs (B, latent_dim) — the RL observation
    target_pc: Array    # (B, N, 3)
    target_gfv: Array   # (B, latent_dim)


def env_reset(model: dict, incomplete_pc: Array, complete_pc: Array,
              mask: Optional[Array] = None) -> EnvState:
    """Vectorised env reset over a whole batch (reference resets with one
    sample and reads batch['incomplete'] — the key the trainer never sends;
    we take arrays directly, removing the bug class entirely)."""
    noisy_gfv = encode(model, incomplete_pc, mask)
    target_gfv = encode(model, complete_pc)
    return EnvState(state=noisy_gfv, target_pc=complete_pc,
                    target_gfv=target_gfv)


def env_step(
    model: dict,
    env: EnvState,
    action: Array,
    *,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
) -> Tuple[EnvState, Array, Array, Dict[str, Array]]:
    """One vectorised environment step: z -> G -> decode -> reward.

    Returns (next_env_state, rewards (B,), dones (B,), info). Episodes are
    single-step, like the reference (done=True after one step,
    rl_gan_net.py:327)."""
    clean_gfv = generate(model, action)
    completed = decode(model, clean_gfv)
    rewards = compute_reward(model, completed, env.target_pc, clean_gfv,
                             env.target_gfv, w_chamfer=w_chamfer,
                             w_gfv=w_gfv, w_discriminator=w_discriminator)
    dones = jnp.ones_like(rewards)
    next_env = EnvState(state=clean_gfv, target_pc=env.target_pc,
                        target_gfv=env.target_gfv)
    info = {"completed_pc": completed, "clean_gfv": clean_gfv}
    return next_env, rewards, dones, info
