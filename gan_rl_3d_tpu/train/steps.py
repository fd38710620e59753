"""Jitted train/eval steps, one per curriculum phase.

Each step is a pure function (params/state/opt-state in, updated versions
out) designed to be wrapped once with `jax.jit(..., static_argnames=...)`
and reused for the whole phase; batches arrive sharded along the mesh's
"data" axis and XLA inserts the gradient all-reduces.

Reference call stacks being covered: SURVEY.md §3.2 (AE step), §3.3
(WGAN-GP step), §3.4 (RL episode), train_rl_gan_net.py:493-522 (joint).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from gan_rl_3d_tpu.config import (AETrainConfig, JointTrainConfig,
                                  LGANTrainConfig)
from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import latent_gan as lg
from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
from gan_rl_3d_tpu.ops import losses as losses_ops
from gan_rl_3d_tpu.ops import pointcloud as pc_ops
from gan_rl_3d_tpu.train import replay_buffer as rb

Array = jax.Array


def _masked_mean(per_sample: Array, pad: Array) -> Array:
    """Mean over real rows, excluding wrap-around padded batch rows."""
    w = 1.0 - pad
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _recon_loss(recon: Array, complete: Array, *, recon_loss: str,
                bidirectional: bool) -> Array:
    """Per-sample reconstruction loss per the loss.{reconstruction_loss,
    chamfer_loss} config knobs (reference configs/config.yaml:87-88 —
    parsed there, always-bidirectional-Chamfer in practice,
    train_rl_gan_net.py:161,236)."""
    if recon_loss == "mse":
        return jnp.mean((recon - complete) ** 2, axis=(-2, -1))
    return chamfer_ops.chamfer_distance(recon, complete,
                                        bidirectional=bidirectional)


# ---------------------------------------------------------------------------
# Phase 1: autoencoder
# ---------------------------------------------------------------------------


def make_ae_optimizer(cfg: AETrainConfig,
                      steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + L2 weight decay + StepLR, matching torch semantics:
    torch.optim.Adam(weight_decay) adds wd*p to the gradient *before* the
    Adam moments (train_rl_gan_net.py:178-188)."""

    if cfg.lr_schedule == "cosine":
        schedule = optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(cfg.epochs * steps_per_epoch, 1))
    else:
        def schedule(count):
            epoch = count // max(steps_per_epoch, 1)
            return cfg.lr * (
                cfg.scheduler_gamma ** (epoch // cfg.scheduler_step))

    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def _policy_cast(tree, dtype):
    """Cast a params pytree to the compute dtype (master copies stay f32 in
    the optimizer; the cast is inside the loss so grads come back f32)."""
    return jax.tree.map(lambda v: v.astype(dtype), tree)


def _policy_cast_ae_selective(tree, dtype):
    """Selective mixed precision for an AE params tree: bf16 everywhere
    except (a) the decoder's final (coordinate-emitting) head layer and
    (b) the encoder's final point-MLP layer — the one whose max-pooled
    output IS the 128-d GFV bottleneck every decoder weight consumes.
    dense_apply promotes the f32 layers' bf16 inputs, so the GFV and the
    predicted coordinates stay unquantized and the Chamfer loss runs f32.

    The recipe is the winner of a measured ladder (flagship data, 20 AE
    epochs, best val chamfer — benchmarks/bf16_recipe_probe.py):
      f32 0.0244 | uniform bf16 0.0404 | +f32 decoder head 0.0384 |
      +f32 input & first encoder layer 0.0377 | +f32 GFV layer 0.0238.
    The train-loss gap (0.030 f32 vs 0.042 bf16) closes exactly when the
    GFV layer is f32: the damage was optimization noise injected at the
    bottleneck, not coordinate representation — docs/PERF.md reject #6."""
    cast = _policy_cast(tree, dtype)
    if "decoder" in tree and "mlp" in tree["decoder"]:
        mlp = list(cast["decoder"]["mlp"])
        mlp[-1] = tree["decoder"]["mlp"][-1]
        cast = dict(cast, decoder=dict(cast["decoder"], mlp=mlp))
    if "encoder" in tree and "point_mlp" in tree["encoder"]:
        pm = list(cast["encoder"]["point_mlp"])
        pm[-1] = tree["encoder"]["point_mlp"][-1]
        cast = dict(cast, encoder=dict(cast["encoder"], point_mlp=pm))
    return cast


@functools.partial(jax.jit, static_argnames=("optimizer", "augment",
                                             "compute_dtype", "spec",
                                             "recon_loss", "bidirectional",
                                             "selective", "bn_stats"))
def ae_train_step(
    params: dict,
    bn_state: dict,
    opt_state,
    batch: Dict[str, Array],
    key,
    *,
    optimizer: optax.GradientTransformation,
    augment: bool = True,
    compute_dtype=None,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
    recon_loss: str = "chamfer",
    bidirectional: bool = True,
    selective: bool = False,
    bn_stats: str = "centered",
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    """One AE step: on-device hole-cutting/augment -> forward -> Chamfer
    (incomplete -> complete, SURVEY §3.2) -> Adam.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: bf16 matmuls
    and activations with f32 master weights, f32 BatchNorm statistics and
    an f32 Chamfer loss (training.precision config knob)."""
    k_data, _ = jax.random.split(key)
    complete, incomplete, mask = pc_ops.make_training_batch(
        k_data, batch["complete_pc"], do_augment=augment, spec=spec)

    def loss_fn(p):
        x_in = incomplete
        if compute_dtype is not None:
            p = (_policy_cast_ae_selective(p, compute_dtype) if selective
                 else _policy_cast(p, compute_dtype))
            x_in = incomplete.astype(compute_dtype)
        with nn.bn_stats_mode(bn_stats):
            (recon, _gfv), new_state = ae.autoencoder_apply(
                p, bn_state, x_in, mask, training=True)
        per = _recon_loss(recon, complete, recon_loss=recon_loss,
                          bidirectional=bidirectional)
        return _masked_mean(per, batch["pad"]), new_state

    (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_state, new_opt_state, {"loss": loss}


@functools.partial(jax.jit, static_argnames=("spec", "recon_loss",
                                             "bidirectional"))
def ae_eval_step(params: dict, bn_state: dict, batch: Dict[str, Array],
                 key, *,
                 spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
                 recon_loss: str = "chamfer",
                 bidirectional: bool = True) -> Dict[str, Array]:
    """Validation: deterministic hole-cutting (keyed), no augmentation,
    eval-mode BN."""
    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False, spec=spec)
    (recon, _), _ = ae.autoencoder_apply(params, bn_state, incomplete, mask,
                                         training=False)
    per = _recon_loss(recon, complete, recon_loss=recon_loss,
                      bidirectional=bidirectional)
    return {"loss": _masked_mean(per, batch["pad"])}


@functools.partial(jax.jit, static_argnames=("optimizer", "augment",
                                             "compute_dtype", "spec",
                                             "recon_loss", "bidirectional",
                                             "selective", "bn_stats"))
def ae_train_epoch(
    params: dict,
    bn_state: dict,
    opt_state,
    epoch_batches: Dict[str, Array],
    key,
    *,
    optimizer: optax.GradientTransformation,
    augment: bool = True,
    compute_dtype=None,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
    recon_loss: str = "chamfer",
    bidirectional: bool = True,
    selective: bool = False,
    bn_stats: str = "centered",
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    """A whole epoch of AE steps as one compiled program (lax.scan over the
    step axis). Per-step host dispatch dominates epoch wall time at this
    model's size; scanning removes it. ``epoch_batches`` fields carry a
    leading step axis: complete_pc (S, B, N, 3), pad (S, B). Returns
    per-step losses (S,) for batch-frequency logging."""

    def body(carry, inp):
        p, s, o = carry
        batch, k = inp
        p, s, o, m = ae_train_step.__wrapped__(
            p, s, o, batch, k, optimizer=optimizer, augment=augment,
            compute_dtype=compute_dtype, spec=spec, recon_loss=recon_loss,
            bidirectional=bidirectional, selective=selective,
            bn_stats=bn_stats)
        return (p, s, o), m["loss"]

    n_steps = epoch_batches["complete_pc"].shape[0]
    keys = jax.random.split(key, n_steps)
    (params, bn_state, opt_state), losses = jax.lax.scan(
        body, (params, bn_state, opt_state), (epoch_batches, keys))
    return params, bn_state, opt_state, {"losses": losses}


def _shard_gathered_batch(batch, batch_sharding):
    """Constrain a batch gathered from replicated resident data back onto
    the mesh's data axis — without this, GSPMD propagates 'replicated' and
    every device would redundantly compute the full batch."""
    if batch_sharding is None:
        return batch
    mesh = batch_sharding.mesh
    spec0 = batch_sharding.spec[0]
    return {
        "complete_pc": jax.lax.with_sharding_constraint(
            batch["complete_pc"], batch_sharding),
        "pad": jax.lax.with_sharding_constraint(
            batch["pad"],
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec(spec0))),
    }


def _resident_gather(data: Array, idx: Array, batch_sharding,
                     data_sharded: bool) -> Array:
    """Gather one batch from the device-resident train split.

    Replicated residency (default): a plain device-local take. Sharded
    residency (training.data_residency="sharded"): the operand is
    row-sharded along "data" and a plain gather would make GSPMD
    all-gather the full split per step — so gather inside shard_map,
    where each shard takes only ITS slots' rows. The shard-aligned batch
    plan (BatchLoader._grouped_epoch_indices) guarantees slot shard d's
    indices fall inside row shard d, making `idx - shard_offset` local by
    construction (out-of-range indices would clamp silently — the
    tests/test_sharding.py residency-equality test is the guard)."""
    if not data_sharded or batch_sharding is None:
        return data[idx]
    mesh = batch_sharding.mesh
    n_data = mesh.shape["data"]
    rows = data.shape[0] // n_data

    def local_take(d, i):
        return d[i - jax.lax.axis_index("data") * rows]

    return shard_map(
        local_take, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False)(data, idx)


@functools.partial(jax.jit, static_argnames=("optimizer", "augment",
                                             "compute_dtype",
                                             "batch_sharding", "spec",
                                             "recon_loss", "bidirectional",
                                             "selective", "bn_stats",
                                             "data_sharded"))
def ae_train_epoch_resident(
    params: dict,
    bn_state: dict,
    opt_state,
    data: Array,
    order: Array,
    pads: Array,
    key,
    *,
    optimizer: optax.GradientTransformation,
    augment: bool = True,
    compute_dtype=None,
    batch_sharding=None,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
    recon_loss: str = "chamfer",
    bidirectional: bool = True,
    selective: bool = False,
    bn_stats: str = "centered",
    data_sharded: bool = False,
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    """AE epoch over a device-resident dataset: the host sends only the
    shuffled index matrix per epoch (S, B) int32 — a few KB — instead of
    re-shipping the point clouds (75 MB/epoch through the host link at the
    default sizes). Batches are gathered on device inside the scan and
    constrained onto the mesh's data axis via ``batch_sharding`` (a
    NamedSharding for a (B, N, 3) batch) so multi-device data parallelism
    is preserved.

    data: (D, N, 3) full train split; order: (S, B) indices; pads: (S, B).
    """

    def body(carry, inp):
        p, s, o = carry
        idx, pad, k = inp
        batch = _shard_gathered_batch(
            {"complete_pc": _resident_gather(data, idx, batch_sharding,
                                             data_sharded),
             "pad": pad}, batch_sharding)
        p, s, o, m = ae_train_step.__wrapped__(
            p, s, o, batch, k, optimizer=optimizer, augment=augment,
            compute_dtype=compute_dtype, spec=spec, recon_loss=recon_loss,
            bidirectional=bidirectional, selective=selective,
            bn_stats=bn_stats)
        return (p, s, o), m["loss"]

    keys = jax.random.split(key, order.shape[0])
    (params, bn_state, opt_state), losses = jax.lax.scan(
        body, (params, bn_state, opt_state), (order, pads, keys))
    return params, bn_state, opt_state, {"losses": losses}


# ---------------------------------------------------------------------------
# Phase 2: GFV extraction
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec",))
def gfv_extract_step(params: dict, bn_state: dict, batch: Dict[str, Array],
                     key, *,
                     spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
                     ) -> Tuple[Array, Array]:
    """Encode (clean_gfv, noisy_gfv) for one batch with the frozen encoder
    (reference generate_gfvs, train_rl_gan_net.py:269-305)."""
    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False, spec=spec)
    clean, _ = ae.any_encoder_apply(params["encoder"], bn_state["encoder"],
                                    complete, training=False)
    noisy, _ = ae.any_encoder_apply(params["encoder"], bn_state["encoder"],
                                    incomplete, mask, training=False)
    return clean, noisy


# ---------------------------------------------------------------------------
# Phase 3: latent WGAN-GP
# ---------------------------------------------------------------------------


def make_gan_optimizer(lr: float, cfg: LGANTrainConfig):
    return optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)


@functools.partial(jax.jit, static_argnames=("d_opt", "lambda_gp", "z_dim"))
def lgan_d_step(
    lgan_params: dict,
    lgan_state: dict,
    d_opt_state,
    real_gfv: Array,
    key,
    *,
    d_opt: optax.GradientTransformation,
    lambda_gp: float = 10.0,
    z_dim: int = 1,
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    """Discriminator step: WGAN loss + gradient penalty (reference
    train_discriminator, latent_gan.py:325-357). The double backward of the
    penalty is native jax.grad-through-jax.grad.

    torch-matching details: the fake batch comes from the *train-mode*
    generator under stop_gradient (the reference generates under no_grad
    with the module still in train mode); dropout and spectral-norm power
    iterations run on every discriminator call (real, fake, interpolates).
    """
    k_z, k_d_real, k_d_fake, k_alpha, k_d_gp = jax.random.split(key, 5)
    z = jax.random.normal(k_z, (real_gfv.shape[0], z_dim))

    fake_gfv, gen_state = lg.generator_apply(
        lgan_params["generator"], lgan_state["generator"], z, training=True)
    fake_gfv = jax.lax.stop_gradient(fake_gfv)

    def loss_fn(d_params):
        real_scores, d_s1 = lg.discriminator_apply(
            d_params, lgan_state["discriminator"], real_gfv,
            training=True, dropout_key=k_d_real)
        fake_scores, d_s2 = lg.discriminator_apply(
            d_params, d_s1, fake_gfv, training=True, dropout_key=k_d_fake)

        def disc_fn(x):
            scores, _ = lg.discriminator_apply(d_params, d_s2, x,
                                               training=True,
                                               dropout_key=k_d_gp)
            return scores

        gp = losses_ops.gradient_penalty(disc_fn, k_alpha, real_gfv,
                                         fake_gfv, lambda_gp=lambda_gp)
        w_loss = jnp.mean(fake_scores) - jnp.mean(real_scores)
        return w_loss + gp, (d_s2, w_loss, gp)

    (d_loss, (d_state, w_loss, gp)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(lgan_params["discriminator"])
    updates, new_opt = d_opt.update(grads, d_opt_state,
                                    lgan_params["discriminator"])
    new_d_params = optax.apply_updates(lgan_params["discriminator"], updates)

    new_params = {"generator": lgan_params["generator"],
                  "discriminator": new_d_params}
    new_state = {"generator": gen_state, "discriminator": d_state}
    metrics = {"d_loss": d_loss, "wasserstein": -w_loss, "gp": gp}
    return new_params, new_state, new_opt, metrics


@functools.partial(jax.jit, static_argnames=("g_opt", "z_dim", "batch_size"))
def lgan_generator_step(
    lgan_params: dict,
    lgan_state: dict,
    g_opt_state,
    key,
    *,
    g_opt: optax.GradientTransformation,
    batch_size: int,
    z_dim: int = 1,
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    k_z, k_drop = jax.random.split(key)
    z = jax.random.normal(k_z, (batch_size, z_dim))

    def loss_fn(g_params):
        fake, g_state = lg.generator_apply(g_params,
                                           lgan_state["generator"], z,
                                           training=True)
        scores, d_state = lg.discriminator_apply(
            lgan_params["discriminator"], lgan_state["discriminator"], fake,
            training=True, dropout_key=k_drop)
        return -jnp.mean(scores), (g_state, d_state)

    (g_loss, (g_state, d_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(lgan_params["generator"])
    updates, new_opt = g_opt.update(grads, g_opt_state,
                                    lgan_params["generator"])
    new_g_params = optax.apply_updates(lgan_params["generator"], updates)
    new_params = {"generator": new_g_params,
                  "discriminator": lgan_params["discriminator"]}
    new_state = {"generator": g_state, "discriminator": d_state}
    return new_params, new_state, new_opt, {"g_loss": g_loss}


@functools.partial(jax.jit, static_argnames=("d_opt", "g_opt", "lambda_gp",
                                             "z_dim", "d_steps"))
def lgan_combined_step(
    lgan_params: dict,
    lgan_state: dict,
    d_opt_state,
    g_opt_state,
    real_gfvs: Array,
    key,
    *,
    d_opt: optax.GradientTransformation,
    g_opt: optax.GradientTransformation,
    lambda_gp: float = 10.0,
    z_dim: int = 1,
    d_steps: int = 5,
) -> Tuple[dict, dict, object, object, Dict[str, Array]]:
    """d_steps discriminator updates + one generator update as ONE compiled
    program (the per-update matmuls are tiny, so the unfused phase-3 loop is
    host-dispatch bound; fusing removes 5 of 6 round trips per iteration).

    ``real_gfvs``: (d_steps, B, latent) — one real batch per D update, like
    the reference's fresh batch per D step.
    """
    k_scan, k_g = jax.random.split(key)

    def d_body(carry, inp):
        params, state, opt_state = carry
        real, k = inp
        params, state, opt_state, m = lgan_d_step.__wrapped__(
            params, state, opt_state, real, k, d_opt=d_opt,
            lambda_gp=lambda_gp, z_dim=z_dim)
        return (params, state, opt_state), m["d_loss"]

    d_keys = jax.random.split(k_scan, d_steps)
    (lgan_params, lgan_state, d_opt_state), d_losses = jax.lax.scan(
        d_body, (lgan_params, lgan_state, d_opt_state), (real_gfvs, d_keys))

    lgan_params, lgan_state, g_opt_state, gm = lgan_generator_step.__wrapped__(
        lgan_params, lgan_state, g_opt_state, k_g, g_opt=g_opt,
        batch_size=real_gfvs.shape[1], z_dim=z_dim)
    metrics = {"d_loss": jnp.mean(d_losses), "g_loss": gm["g_loss"]}
    return lgan_params, lgan_state, d_opt_state, g_opt_state, metrics


@functools.partial(jax.jit, static_argnames=("d_opt", "lambda_gp", "z_dim"))
def lgan_d_refresh(
    lgan_params: dict,
    lgan_state: dict,
    d_opt_state,
    real_gfvs: Array,
    key,
    *,
    d_opt: optax.GradientTransformation,
    lambda_gp: float = 10.0,
    z_dim: int = 1,
) -> Tuple[dict, dict, object, Dict[str, Array]]:
    """Discriminator-only refresh: K WGAN-GP D updates with the generator
    frozen, as one compiled scan. Used after joint fine-tuning to retrain
    the hybrid gate's critic on the post-joint GFV distribution — joint
    training shifts both the encoder's clean GFVs (the real samples) and
    G's outputs (the fakes), leaving the phase-3 D stale (the gate
    misrouting measured in headtohead/RESULTS.md).

    ``real_gfvs``: (K, B, latent) re-extracted post-joint clean GFVs.
    Fakes come from the current (frozen) generator inside lgan_d_step.
    """

    def body(carry, inp):
        params, state, opt_state = carry
        real, k = inp
        params, state, opt_state, m = lgan_d_step.__wrapped__(
            params, state, opt_state, real, k, d_opt=d_opt,
            lambda_gp=lambda_gp, z_dim=z_dim)
        return (params, state, opt_state), m["d_loss"]

    keys = jax.random.split(key, real_gfvs.shape[0])
    (lgan_params, lgan_state, d_opt_state), d_losses = jax.lax.scan(
        body, (lgan_params, lgan_state, d_opt_state), (real_gfvs, keys))
    return lgan_params, lgan_state, d_opt_state, {"d_losses": d_losses}


# ---------------------------------------------------------------------------
# Phase 4: RL (vmapped env collect + TD3 update in one jitted step)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "w_chamfer", "w_gfv",
                                             "w_discriminator",
                                             "start_training_size",
                                             "steps_per_episode",
                                             "updates_per_step", "spec"))
def rl_step(
    model: dict,
    buffer: rb.ReplayBuffer,
    ou_states: Array,
    batch: Dict[str, Array],
    key,
    *,
    cfg: rl.TD3Config,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
    start_training_size: int = 64,
    steps_per_episode: int = 1,
    updates_per_step: int = 1,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
) -> Tuple[dict, rb.ReplayBuffer, Array, Dict[str, Array]]:
    """One RL iteration over B parallel episodes of ``steps_per_episode``
    environment steps each:

    cut holes -> env_reset (encode) -> scan[actor+OU -> env_step (G ->
    decode -> reward)] -> push B*S transitions -> TD3 updates.

    Replaces the reference's one-sample host-side episode loop
    (train_rl_gan_net.py:388-429) and honours start_training_steps, which
    the reference reads from config but never uses. ``steps_per_episode=1``
    reproduces the reference's effective behaviour (its env terminates after
    one step, rl_gan_net.py:327); larger values chain the episode through
    the generated clean GFVs with done only on the final step — the
    multi-step regime its max_steps_per_episode knob gestured at. Within an
    episode the policy is the iteration's snapshot (the reference updates
    between steps; immaterial at 1 step, documented at >1).
    """
    k_data, k_scan, k_upd = jax.random.split(key, 3)
    complete, incomplete, mask = pc_ops.make_training_batch(
        k_data, batch["complete_pc"], do_augment=False, spec=spec)

    env0 = net.env_reset(model, incomplete, complete, mask)

    def step_body(carry, step_key_done):
        state_vec, env_state, ou = carry
        k_act, is_last = step_key_done
        action, ou = rl.select_action(model["agent"], state_vec, cfg,
                                      key=k_act, ou_state=ou,
                                      add_noise=True)
        env_next, rewards, _dones, _ = net.env_step(
            model, env_state, action, w_chamfer=w_chamfer, w_gfv=w_gfv,
            w_discriminator=w_discriminator)
        dones = jnp.full_like(rewards, is_last)
        tr = rl.TransitionBatch(
            states=state_vec, actions=action, rewards=rewards[:, None],
            next_states=env_next.state, dones=dones[:, None])
        return (env_next.state, env_next, ou), (tr, rewards)

    step_keys = jax.random.split(k_scan, steps_per_episode)
    is_last = jnp.arange(steps_per_episode) == steps_per_episode - 1
    (_, _, new_ou), (trs, all_rewards) = jax.lax.scan(
        step_body, (env0.state, env0, ou_states),
        (step_keys, is_last.astype(jnp.float32)))

    # flatten (S, B, ...) -> (S*B, ...) and push
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), trs)
    buffer = rb.buffer_add_batch(buffer, flat)

    def do_update(agent):
        def upd(carry, k):
            agent, _ = carry
            k_s, k_u = jax.random.split(k)
            sample = rb.buffer_sample(buffer, k_s, cfg.batch_size)
            agent, m = rl.agent_update(agent, sample, k_u, cfg)
            return (agent, m), None

        upd_keys = jax.random.split(k_upd, updates_per_step)
        (agent, m), _ = jax.lax.scan(upd, (agent, {
            "critic_loss": jnp.zeros(()), "actor_loss": jnp.zeros(())}),
            upd_keys)
        return agent, m

    def skip_update(agent):
        return agent, {"critic_loss": jnp.zeros(()),
                       "actor_loss": jnp.zeros(())}

    agent, metrics = jax.lax.cond(
        buffer.size >= jnp.int32(max(start_training_size, cfg.batch_size)),
        do_update, skip_update, model["agent"])

    new_model = dict(model, agent=agent)
    # episode reward = per-env sum over the episode's steps, excluding
    # wrap-around padded batch rows (their transitions are duplicates of
    # real clouds, harmless in the buffer but excluded from the metric)
    episode_rewards = jnp.sum(all_rewards, axis=0)
    metrics = dict(metrics,
                   reward=_masked_mean(episode_rewards, batch["pad"]))
    return new_model, buffer, new_ou, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def rl_eval_reward(
    model: dict,
    batch: Dict[str, Array],
    key,
    *,
    cfg: rl.TD3Config,
    w_chamfer: float = 100.0,
    w_gfv: float = 10.0,
    w_discriminator: float = 0.01,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
) -> Dict[str, Array]:
    """Greedy (no exploration noise) single-step eval on a fixed batch —
    the learning-curve metrics the training-time reward can't provide: the
    per-iteration `rl_step` reward is computed on a different random batch
    with OU noise each time, so its variance (~±1.5 at quick-config reward
    scale) swamps the policy's actual progress. Called by the trainer on
    one fixed validation batch every eval interval; logged as
    RL/Eval_Reward AND RL/Eval_Chamfer. The chamfer curve exists because
    the composite reward can be anti-correlated with completion quality —
    its w_gfv term scores how close G(z) lands to the NOISY GFV, which is
    not the goal — and masked a genuinely-learning agent on the variant
    architecture (benchmarks/z_sweep.py: agent z 28% better chamfer than
    zero z while the reward curve declined; runs/variant/RESULTS.md). The
    reference has no counterpart (its phase 4 crashes;
    train_rl_gan_net.py:422-437 logs only the noisy training reward)."""
    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False, spec=spec)
    env0 = net.env_reset(model, incomplete, complete, mask)
    action, _ = rl.select_action(model["agent"], env0.state, cfg,
                                 add_noise=False)
    _, rewards, _, info = net.env_step(
        model, env0, action, w_chamfer=w_chamfer, w_gfv=w_gfv,
        w_discriminator=w_discriminator)
    per_cd = chamfer_ops.chamfer_distance(info["completed_pc"],
                                          env0.target_pc)
    return {"reward": _masked_mean(rewards, batch["pad"]),
            "chamfer": _masked_mean(per_cd, batch["pad"])}


# ---------------------------------------------------------------------------
# Phase 5: joint fine-tune
# ---------------------------------------------------------------------------


def make_joint_optimizer(cfg: JointTrainConfig):
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lambda _: cfg.lr),
    )


@functools.partial(jax.jit, static_argnames=("optimizer", "cfg",
                                             "compute_dtype", "spec",
                                             "bidirectional", "w_ae_recon",
                                             "selective", "bn_stats",
                                             "freeze_generator"))
def joint_train_step(
    model: dict,
    opt_state,
    batch: Dict[str, Array],
    key,
    *,
    optimizer: optax.GradientTransformation,
    cfg: rl.TD3Config,
    compute_dtype=None,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
    bidirectional: bool = True,
    w_ae_recon: float = 0.0,
    selective: bool = False,
    bn_stats: str = "centered",
    freeze_generator: bool = False,
) -> Tuple[dict, object, Dict[str, Array]]:
    """Joint fine-tune (reference train_joint_epoch,
    train_rl_gan_net.py:493-522): loss = Chamfer(decode(G(z)), complete) +
    0.1 * MSE(clean_gfv, noisy_gfv); z comes from the frozen actor (the
    reference computes it through numpy, so no gradient flows into the
    agent there either). Trains encoder, decoder and generator.

    ``w_ae_recon`` > 0 adds w * Chamfer(decode(noisy_gfv), complete) —
    the AE path the hybrid gate falls back on, which the reference's joint
    loss silently degrades (its phase 5 makes the AE path *worse* than
    phase 1's; runs/best/RESULTS.md). Both GFVs then ride one (2B, .)
    decoder pass, so the extra term costs one decode, not two.

    ``freeze_generator`` keeps G exactly as phase 3 left it — params out
    of the trainable set, norm state untouched (eval-mode forward) — so
    the agent's learned z->GFV landscape survives phase 5 (the measured
    pathology: joint shifts G under the trained agent and degrades the
    per-sample oracle, runs/zdim/RESULTS.md section 8)."""
    k_data, _ = jax.random.split(key)
    complete, incomplete, mask = pc_ops.make_training_batch(
        k_data, batch["complete_pc"], do_augment=True, spec=spec)

    trainable = {"ae": model["ae"]["params"]}
    if not freeze_generator:
        trainable["gen"] = model["lgan"]["params"]["generator"]

    def loss_fn(tp):
        x_in = incomplete
        if freeze_generator:
            tp = dict(tp,
                      gen=jax.lax.stop_gradient(
                          model["lgan"]["params"]["generator"]))
        if compute_dtype is not None:
            if selective:
                tp = {"ae": _policy_cast_ae_selective(tp["ae"],
                                                      compute_dtype),
                      "gen": _policy_cast(tp["gen"], compute_dtype)}
            else:
                tp = _policy_cast(tp, compute_dtype)
            x_in = incomplete.astype(compute_dtype)
        with nn.bn_stats_mode(bn_stats):
            noisy_gfv, enc_state = ae.any_encoder_apply(
                tp["ae"]["encoder"], model["ae"]["state"]["encoder"],
                x_in, mask, training=True)
            z, _ = rl.actor_apply(model["agent"]["actor"]["params"],
                                  model["agent"]["actor"]["state"],
                                  noisy_gfv, cfg=cfg, training=False)
            z = jax.lax.stop_gradient(z)
            clean_gfv, gen_state = lg.generator_apply(
                tp["gen"], model["lgan"]["state"]["generator"], z,
                training=not freeze_generator)
            if w_ae_recon > 0.0:
                bsz = clean_gfv.shape[0]
                both, dec_state = ae.any_decoder_apply(
                    tp["ae"]["decoder"], model["ae"]["state"]["decoder"],
                    jnp.concatenate([clean_gfv, noisy_gfv], axis=0),
                    training=True)
                completed, ae_recon = both[:bsz], both[bsz:]
            else:
                completed, dec_state = ae.any_decoder_apply(
                    tp["ae"]["decoder"], model["ae"]["state"]["decoder"],
                    clean_gfv, training=True)
        per = chamfer_ops.chamfer_distance(completed, complete,
                                           bidirectional=bidirectional)
        ch = _masked_mean(per, batch["pad"])
        gl = losses_ops.gfv_loss(clean_gfv, noisy_gfv)
        loss = ch + 0.1 * gl
        if w_ae_recon > 0.0:
            per_ae = chamfer_ops.chamfer_distance(
                ae_recon, complete, bidirectional=bidirectional)
            loss = loss + w_ae_recon * _masked_mean(per_ae, batch["pad"])
        return loss, (enc_state, gen_state, dec_state, ch, gl)

    (loss, (enc_s, gen_s, dec_s, ch, gl)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(trainable)
    updates, new_opt = optimizer.update(grads, opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)

    new_model = dict(model)
    new_model["ae"] = {
        "params": new_trainable["ae"],
        "state": {"encoder": enc_s, "decoder": dec_s},
    }
    if freeze_generator:
        new_gen_p = model["lgan"]["params"]["generator"]
        gen_s = model["lgan"]["state"]["generator"]  # eval fwd left it alone
    else:
        new_gen_p = new_trainable["gen"]
    new_model["lgan"] = {
        "params": {"generator": new_gen_p,
                   "discriminator": model["lgan"]["params"]["discriminator"]},
        "state": {"generator": gen_s,
                  "discriminator": model["lgan"]["state"]["discriminator"]},
    }
    return new_model, new_opt, {"loss": loss, "chamfer": ch, "gfv": gl}


@functools.partial(jax.jit, static_argnames=("optimizer", "cfg",
                                             "compute_dtype",
                                             "batch_sharding", "spec",
                                             "bidirectional", "w_ae_recon",
                                             "selective", "bn_stats",
                                             "freeze_generator",
                                             "data_sharded"))
def joint_train_epoch_resident(
    model: dict,
    opt_state,
    data: Array,
    order: Array,
    pads: Array,
    key,
    *,
    optimizer: optax.GradientTransformation,
    cfg: rl.TD3Config,
    compute_dtype=None,
    batch_sharding=None,
    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
    bidirectional: bool = True,
    w_ae_recon: float = 0.0,
    selective: bool = False,
    bn_stats: str = "centered",
    freeze_generator: bool = False,
    data_sharded: bool = False,
) -> Tuple[dict, object, Dict[str, Array]]:
    """A whole joint fine-tune epoch as one compiled scan over a
    device-resident dataset (same pattern as ae_train_epoch_resident)."""

    def body(carry, inp):
        mdl, o = carry
        idx, pad, k = inp
        batch = _shard_gathered_batch(
            {"complete_pc": _resident_gather(data, idx, batch_sharding,
                                             data_sharded),
             "pad": pad}, batch_sharding)
        mdl, o, m = joint_train_step.__wrapped__(
            mdl, o, batch, k, optimizer=optimizer, cfg=cfg,
            compute_dtype=compute_dtype, spec=spec,
            bidirectional=bidirectional, w_ae_recon=w_ae_recon,
            selective=selective, bn_stats=bn_stats,
            freeze_generator=freeze_generator)
        return (mdl, o), m["loss"]

    keys = jax.random.split(key, order.shape[0])
    (model, opt_state), losses = jax.lax.scan(
        body, (model, opt_state), (order, pads, keys))
    return model, opt_state, {"losses": losses}


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "bidirectional",
                                             "gate_mode", "gate_bias"))
def joint_eval_step(model: dict, batch: Dict[str, Array], key, *,
                    cfg: rl.TD3Config,
                    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
                    bidirectional: bool = True,
                    gate_mode: str = "discriminator",
                    gate_bias: float = 0.0) -> Dict[str, Array]:
    """Validation through the full inference path with the hybrid gate
    (reference validate_joint, train_rl_gan_net.py:524-544)."""
    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False, spec=spec)
    out = net.complete(model, incomplete, mask, cfg=cfg,
                       gate_mode=gate_mode, gate_bias=gate_bias)
    per = chamfer_ops.chamfer_distance(out["hybrid_output"], complete,
                                       bidirectional=bidirectional)
    return {"loss": _masked_mean(per, batch["pad"])}
