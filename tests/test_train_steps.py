"""Jitted train-step tests: losses fall, states thread, every phase runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.train import replay_buffer as rb
from gan_rl_3d_tpu.train import steps

N_POINTS = 256
SMALL = {
    "model": {"autoencoder": {"num_points": N_POINTS,
                              "decoder_dims": [256, 256, N_POINTS * 3]}},
    "training": {"batch_size": 8},
}


@pytest.fixture(scope="module")
def config():
    return load_config(None, overrides=SMALL)


@pytest.fixture(scope="module")
def model(config):
    return net.init_model(jax.random.PRNGKey(0), config)


def _batch(key, b=8):
    pc = jax.random.normal(key, (b, N_POINTS, 3))
    return {"complete_pc": pc, "pad": jnp.zeros((b,))}


def test_ae_step_reduces_loss(config, model):
    cfg = config.training.autoencoder
    opt = steps.make_ae_optimizer(cfg, steps_per_epoch=10)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    batch = _batch(key)
    losses = []
    for i in range(30):
        params, state, opt_state, m = steps.ae_train_step(
            params, state, opt_state, batch, jax.random.fold_in(key, i),
            optimizer=opt, augment=False)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"AE loss did not fall: {losses[:3]}...{losses[-3:]}"
    assert np.isfinite(losses).all()


def test_ae_eval_step_deterministic(config, model):
    key = jax.random.PRNGKey(2)
    batch = _batch(key)
    m1 = steps.ae_eval_step(model["ae"]["params"], model["ae"]["state"],
                            batch, key)
    m2 = steps.ae_eval_step(model["ae"]["params"], model["ae"]["state"],
                            batch, key)
    assert float(m1["loss"]) == float(m2["loss"])


def test_gfv_extract(config, model):
    key = jax.random.PRNGKey(3)
    clean, noisy = steps.gfv_extract_step(model["ae"]["params"],
                                          model["ae"]["state"],
                                          _batch(key), key)
    assert clean.shape == (8, 128)
    assert noisy.shape == (8, 128)
    assert not np.allclose(np.asarray(clean), np.asarray(noisy))


def test_wgan_gp_steps(config, model):
    lcfg = config.training.lgan
    g_opt = steps.make_gan_optimizer(lcfg.generator_lr, lcfg)
    d_opt = steps.make_gan_optimizer(lcfg.discriminator_lr, lcfg)
    lp, ls = model["lgan"]["params"], model["lgan"]["state"]
    g_state = g_opt.init(lp["generator"])
    d_state = d_opt.init(lp["discriminator"])
    key = jax.random.PRNGKey(4)
    real = jax.random.normal(key, (16, 128))

    for i in range(3):
        lp, ls, d_state, dm = steps.lgan_d_step(
            lp, ls, d_state, real, jax.random.fold_in(key, i), d_opt=d_opt,
            lambda_gp=lcfg.lambda_gp)
        assert np.isfinite(float(dm["d_loss"]))
        assert float(dm["gp"]) >= 0.0
    lp2, ls2, g_state, gm = steps.lgan_generator_step(
        lp, ls, g_state, key, g_opt=g_opt, batch_size=16)
    assert np.isfinite(float(gm["g_loss"]))
    # generator changed, discriminator untouched by g step
    assert not np.allclose(
        np.asarray(lp2["generator"]["mlp"][0]["dense"]["w"]),
        np.asarray(lp["generator"]["mlp"][0]["dense"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(lp2["discriminator"]["layers"][0]["dense"]["w"]),
        np.asarray(lp["discriminator"]["layers"][0]["dense"]["w"]))


def test_rl_step_fills_buffer_and_updates(config, model):
    td3 = config.td3_config()
    buffer = rb.buffer_init(1000, td3.state_dim, td3.action_dim)
    ou = rl.ou_init(td3, (8,))
    key = jax.random.PRNGKey(5)
    m = model
    # below start size: buffer fills, no update
    m, buffer, ou, metrics = steps.rl_step(
        m, buffer, ou, _batch(key), key, cfg=td3, start_training_size=64)
    assert int(buffer.size) == 8
    assert float(metrics["critic_loss"]) == 0.0
    # fill beyond start size -> update fires
    step0 = int(m["agent"]["step"])
    for i in range(8):
        m, buffer, ou, metrics = steps.rl_step(
            m, buffer, ou, _batch(jax.random.fold_in(key, i)),
            jax.random.fold_in(key, 100 + i), cfg=td3,
            start_training_size=64)
    assert int(buffer.size) == 72
    assert int(m["agent"]["step"]) > step0
    assert np.isfinite(float(metrics["reward"]))


def test_replay_buffer_ring_semantics():
    buf = rb.buffer_init(10, 4, 1)
    batch = rl.TransitionBatch(
        states=jnp.arange(6 * 4, dtype=jnp.float32).reshape(6, 4),
        actions=jnp.ones((6, 1)), rewards=jnp.ones((6, 1)),
        next_states=jnp.zeros((6, 4)), dones=jnp.zeros((6, 1)))
    buf = rb.buffer_add_batch(buf, batch)
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    buf = rb.buffer_add_batch(buf, batch)  # wraps
    assert int(buf.size) == 10 and int(buf.ptr) == 2
    sample = rb.buffer_sample(buf, jax.random.PRNGKey(0), 32)
    assert sample.states.shape == (32, 4)


def test_joint_step(config, model):
    jcfg = config.training.joint
    opt = steps.make_joint_optimizer(jcfg)
    m = model
    opt_state = opt.init({"ae": m["ae"]["params"],
                          "gen": m["lgan"]["params"]["generator"]})
    key = jax.random.PRNGKey(6)
    batch = _batch(key)
    losses = []
    for i in range(5):
        m, opt_state, metrics = steps.joint_train_step(
            m, opt_state, batch, jax.random.fold_in(key, i), optimizer=opt,
            cfg=config.td3_config())
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    vm = steps.joint_eval_step(m, batch, key, cfg=config.td3_config())
    assert np.isfinite(float(vm["loss"]))


def test_joint_step_freeze_generator(config, model):
    """joint.freeze_generator keeps G bit-identical (params AND norm
    state) while the AE still trains; default (False) moves G."""
    opt = steps.make_joint_optimizer(config.training.joint)
    key = jax.random.PRNGKey(16)
    batch = _batch(key)

    def run(freeze):
        m = model
        tr = {"ae": m["ae"]["params"]}
        if not freeze:
            tr["gen"] = m["lgan"]["params"]["generator"]
        opt_state = opt.init(tr)
        for i in range(2):
            m, opt_state, metrics = steps.joint_train_step(
                m, opt_state, batch, jax.random.fold_in(key, i),
                optimizer=opt, cfg=config.td3_config(),
                freeze_generator=freeze)
            assert np.isfinite(float(metrics["loss"]))
        return m

    m_frozen = run(True)
    for a, b in zip(
            jax.tree.leaves({"p": model["lgan"]["params"]["generator"],
                             "s": model["lgan"]["state"]["generator"]}),
            jax.tree.leaves({"p": m_frozen["lgan"]["params"]["generator"],
                             "s": m_frozen["lgan"]["state"]["generator"]})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # AE moved
    ae_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(model["ae"]["params"]),
                        jax.tree.leaves(m_frozen["ae"]["params"])))
    assert ae_moved
    # and the default still trains G
    m_free = run(False)
    gen_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(model["lgan"]["params"]["generator"]),
            jax.tree.leaves(m_free["lgan"]["params"]["generator"])))
    assert gen_moved


def test_rl_step_multi_step_episodes(config, model):
    """steps_per_episode > 1 chains episodes through generated GFVs,
    storing S*B transitions with done only on the final step."""
    td3 = config.td3_config()
    buffer = rb.buffer_init(1000, td3.state_dim, td3.action_dim)
    ou = rl.ou_init(td3, (8,))
    key = jax.random.PRNGKey(7)
    m, buffer, ou, metrics = steps.rl_step(
        model, buffer, ou, _batch(key), key, cfg=td3,
        start_training_size=1000, steps_per_episode=3)
    assert int(buffer.size) == 24  # 3 steps x 8 envs
    dones = np.asarray(buffer.dones[:24]).reshape(3, 8)
    np.testing.assert_array_equal(dones[:2], 0.0)
    np.testing.assert_array_equal(dones[2], 1.0)
    assert np.isfinite(float(metrics["reward"]))
    # multiple updates per iteration advance the TD3 step counter once the
    # buffer exceeds the TD3 batch size (24 + 5*8 = 64 = cfg.batch_size)
    m2, buffer, ou, _ = steps.rl_step(
        m, buffer, ou, _batch(key), jax.random.fold_in(key, 1), cfg=td3,
        start_training_size=8, steps_per_episode=5, updates_per_step=3)
    assert int(buffer.size) == 64
    assert int(m2["agent"]["step"]) == 3


def test_ae_step_bf16_policy(config, model):
    """bf16 mixed precision: loss falls, grads/master weights stay f32."""
    import jax.numpy as jnp
    cfg = config.training.autoencoder
    opt = steps.make_ae_optimizer(cfg, steps_per_epoch=10)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(11)
    batch = _batch(key)
    losses = []
    for i in range(20):
        params, state, opt_state, m = steps.ae_train_step(
            params, state, opt_state, batch, jax.random.fold_in(key, i),
            optimizer=opt, augment=False, compute_dtype=jnp.bfloat16)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # master weights and BN stats remain f32
    w = params["encoder"]["point_mlp"][0]["dense"]["w"]
    assert w.dtype == jnp.float32
    assert state["encoder"]["point_mlp"][0]["bn"]["mean"].dtype == jnp.float32


def test_ae_step_bf16_selective_keeps_f32_head(config, model):
    """bf16_selective: the step trains (loss falls), and with the f32
    decoder head the emitted coordinates are f32 inside the loss — checked
    via _policy_cast_ae_selective leaving the head untouched while the
    rest casts."""
    import jax.numpy as jnp
    from gan_rl_3d_tpu.train.steps import _policy_cast_ae_selective

    params = model["ae"]["params"]
    cast = _policy_cast_ae_selective(params, jnp.bfloat16)
    assert cast["decoder"]["mlp"][-1]["dense"]["w"].dtype == jnp.float32
    assert cast["decoder"]["mlp"][0]["dense"]["w"].dtype == jnp.bfloat16
    # the encoder's final (GFV-bottleneck) layer stays f32 too — the
    # recipe's load-bearing half (benchmarks/bf16_recipe_probe.py ladder)
    assert cast["encoder"]["point_mlp"][-1]["dense"]["w"].dtype == jnp.float32
    assert cast["encoder"]["point_mlp"][0]["dense"]["w"].dtype == jnp.bfloat16
    # and the f32-head dense emits f32 from a bf16 input (dense_apply
    # follows the weight dtype)
    from gan_rl_3d_tpu import nn as nn_lib
    x = jnp.ones((2, cast["decoder"]["mlp"][-1]["dense"]["w"].shape[0]),
                 jnp.bfloat16)
    y = nn_lib.dense_apply(cast["decoder"]["mlp"][-1]["dense"], x)
    assert y.dtype == jnp.float32

    cfg = config.training.autoencoder
    opt = steps.make_ae_optimizer(cfg, steps_per_epoch=10)
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(12)
    batch = _batch(key)
    losses = []
    for i in range(20):
        params, state, opt_state, m = steps.ae_train_step(
            params, state, opt_state, batch, jax.random.fold_in(key, i),
            optimizer=opt, augment=False, compute_dtype=jnp.bfloat16,
            selective=True)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_lgan_combined_step_matches_sequential(config, model):
    """The fused d_steps+g program must behave like the sequential calls
    (same keys/batches -> same losses and params)."""
    lcfg = config.training.lgan
    g_opt = steps.make_gan_optimizer(lcfg.generator_lr, lcfg)
    d_opt = steps.make_gan_optimizer(lcfg.discriminator_lr, lcfg)
    key = jax.random.PRNGKey(21)
    reals = jax.random.normal(key, (3, 16, 128))

    # fused
    lp, ls = model["lgan"]["params"], model["lgan"]["state"]
    d_state, g_state = d_opt.init(lp["discriminator"]), g_opt.init(lp["generator"])
    lp_f, ls_f, _, _, m = steps.lgan_combined_step(
        lp, ls, d_state, g_state, reals, key, d_opt=d_opt, g_opt=g_opt,
        d_steps=3)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))

    # sequential with the same key schedule
    k_scan, k_g = jax.random.split(key)
    d_keys = jax.random.split(k_scan, 3)
    lp2, ls2 = lp, ls
    d_state2 = d_opt.init(lp["discriminator"])
    for i in range(3):
        lp2, ls2, d_state2, _ = steps.lgan_d_step(
            lp2, ls2, d_state2, reals[i], d_keys[i], d_opt=d_opt)
    g_state2 = g_opt.init(lp["generator"])
    lp2, ls2, g_state2, gm2 = steps.lgan_generator_step(
        lp2, ls2, g_state2, k_g, g_opt=g_opt, batch_size=16)

    np.testing.assert_allclose(float(m["g_loss"]), float(gm2["g_loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lp_f["generator"]["mlp"][0]["dense"]["w"]),
        np.asarray(lp2["generator"]["mlp"][0]["dense"]["w"]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lp_f["discriminator"]["layers"][0]["dense"]["w"]),
        np.asarray(lp2["discriminator"]["layers"][0]["dense"]["w"]),
        rtol=1e-4, atol=1e-6)


def test_ae_epoch_scan_matches_stepwise(config, model):
    """One scanned epoch must equal the same sequence of individual steps."""
    cfg = config.training.autoencoder
    opt = steps.make_ae_optimizer(cfg, steps_per_epoch=4)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    key = jax.random.PRNGKey(31)
    batches = [_batch(jax.random.fold_in(key, i)) for i in range(4)]

    # scanned
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    p1, s1, o1, m = steps.ae_train_epoch(
        params, state, opt.init(params), stacked, key, optimizer=opt,
        augment=False)
    # stepwise with the identical key schedule
    keys = jax.random.split(key, 4)
    p2, s2, o2 = params, state, opt.init(params)
    step_losses = []
    for b, k in zip(batches, keys):
        p2, s2, o2, sm = steps.ae_train_step(p2, s2, o2, b, k,
                                             optimizer=opt, augment=False)
        step_losses.append(float(sm["loss"]))
    np.testing.assert_allclose(np.asarray(m["losses"]), step_losses,
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["encoder"]["point_mlp"][0]["dense"]["w"]),
        np.asarray(p2["encoder"]["point_mlp"][0]["dense"]["w"]),
        rtol=1e-5, atol=1e-7)


def test_rl_eval_reward_greedy_and_deterministic(config, model):
    """The learning-curve metric (steps.rl_eval_reward) must be a pure
    function of (model, batch, key) — same key, same reward — and must use
    the greedy policy: it matches a manual no-noise env rollout."""
    td3 = config.td3_config()
    key = jax.random.PRNGKey(77)
    batch = {"complete_pc": jax.random.normal(jax.random.PRNGKey(8),
                                              (8, N_POINTS, 3)),
             "pad": jnp.zeros((8,))}

    m1 = steps.rl_eval_reward(model, batch, key, cfg=td3)
    m2 = steps.rl_eval_reward(model, batch, key, cfg=td3)
    r1 = float(m1["reward"])
    assert r1 == float(m2["reward"])
    assert np.isfinite(r1)
    assert np.isfinite(float(m1["chamfer"])) and float(m1["chamfer"]) > 0

    # manual greedy rollout with the same fixed hole-cut key
    from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
    from gan_rl_3d_tpu.ops import pointcloud as pc_ops

    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False)
    env0 = net.env_reset(model, incomplete, complete, mask)
    action, _ = rl.select_action(model["agent"], env0.state, td3,
                                 add_noise=False)
    _, rewards, _, info = net.env_step(model, env0, action)
    assert np.isclose(r1, float(jnp.mean(rewards)), rtol=1e-5)
    cd = chamfer_ops.chamfer_distance(info["completed_pc"], complete)
    assert np.isclose(float(m1["chamfer"]), float(jnp.mean(cd)), rtol=1e-5)


def test_zdim_multi_dimensional_action_space():
    """z_dim/action_dim > 1 (the beyond-parity ablation, runs/zdim) flows
    through the LGAN, the RL env/update, and the composite pipeline with
    correct shapes. The reference pins z_dim=1 (configs/config.yaml:16);
    every step here must stay shape-generic in it."""
    overrides = dict(SMALL)
    overrides["model"] = dict(SMALL["model"])
    overrides["model"]["lgan"] = {"z_dim": 8}
    overrides["model"]["rl_agent"] = {"action_dim": 8, "batch_size": 16}
    config = load_config(None, overrides=overrides)
    model = net.init_model(jax.random.PRNGKey(0), config)
    td3 = config.td3_config()
    assert td3.action_dim == 8
    key = jax.random.PRNGKey(3)
    batch = _batch(key)

    # LGAN D+G steps at z_dim=8
    gfv = jax.random.normal(key, (16, config.model.lgan.latent_dim))
    lcfg = config.training.lgan
    d_opt = steps.make_gan_optimizer(lcfg.discriminator_lr, lcfg)
    g_opt = steps.make_gan_optimizer(lcfg.generator_lr, lcfg)
    lp, ls = model["lgan"]["params"], model["lgan"]["state"]
    d_state, g_state = (d_opt.init(lp["discriminator"]),
                        g_opt.init(lp["generator"]))
    lp, ls, d_state, dm = steps.lgan_d_step(
        lp, ls, d_state, gfv, key, d_opt=d_opt,
        lambda_gp=lcfg.lambda_gp, z_dim=config.model.lgan.z_dim)
    lp, ls, g_state, gm = steps.lgan_generator_step(
        lp, ls, g_state, key, g_opt=g_opt, batch_size=16,
        z_dim=config.model.lgan.z_dim)
    assert np.isfinite(float(dm["d_loss"])) and np.isfinite(float(gm["g_loss"]))

    # RL env + TD3 update at action_dim=8
    buffer = rb.buffer_init(256, td3.state_dim, td3.action_dim)
    ou = rl.ou_init(td3, (8,))
    assert ou.shape == (8, 8)
    m = model
    for i in range(3):
        m, buffer, ou, metrics = steps.rl_step(
            m, buffer, ou, _batch(jax.random.fold_in(key, i)),
            jax.random.fold_in(key, 10 + i), cfg=td3,
            start_training_size=16)
    assert np.asarray(buffer.actions).shape[1] == 8
    assert int(m["agent"]["step"]) > 0
    assert np.isfinite(float(metrics["reward"]))

    # composite completion pipeline
    out = net.complete(m, batch["complete_pc"], cfg=td3)
    assert out["z_vector"].shape == (8, 8)
    assert out["hybrid_output"].shape == batch["complete_pc"].shape
    assert np.isfinite(np.asarray(out["hybrid_output"])).all()
