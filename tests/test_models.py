"""Model shape, jit, and state-threading tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import Config
from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import latent_gan as lg
from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.models import rl_gan_net as net


def test_autoencoder_shapes_and_state():
    key = jax.random.PRNGKey(0)
    params, state = ae.autoencoder_init(key, num_points=256,
                                        decoder_dims=(256, 256, 768))
    pc = jax.random.normal(key, (4, 256, 3))
    (recon, gfv), new_state = ae.autoencoder_apply(params, state, pc,
                                                   training=True)
    assert gfv.shape == (4, 128)
    assert recon.shape == (4, 256, 3)
    # training must advance BN running stats
    old = state["encoder"]["point_mlp"][0]["bn"]["mean"]
    new = new_state["encoder"]["point_mlp"][0]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    # eval must not
    _, eval_state = ae.autoencoder_apply(params, new_state, pc, training=False)
    np.testing.assert_array_equal(
        np.asarray(eval_state["encoder"]["point_mlp"][0]["bn"]["mean"]),
        np.asarray(new))


def test_masked_maxpool_ignores_padding():
    key = jax.random.PRNGKey(1)
    params, state = ae.encoder_init(key)
    real = jax.random.normal(key, (2, 100, 3))
    junk = 100.0 * jnp.ones((2, 28, 3))
    padded = jnp.concatenate([real, junk], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 100)), jnp.zeros((2, 28))], axis=1)
    gfv_masked, _ = ae.encoder_apply(params, state, padded, mask)
    gfv_real, _ = ae.encoder_apply(params, state, real)
    np.testing.assert_allclose(np.asarray(gfv_masked), np.asarray(gfv_real),
                               rtol=1e-5, atol=1e-5)
    # unmasked, the junk corrupts the pool (the reference's latent flaw)
    gfv_unmasked, _ = ae.encoder_apply(params, state, padded)
    assert not np.allclose(np.asarray(gfv_unmasked), np.asarray(gfv_real),
                           atol=1e-3)


def test_lgan_shapes():
    key = jax.random.PRNGKey(2)
    params, state = lg.lgan_init(key)
    z = jax.random.normal(key, (8, 1))
    gfv, _ = lg.lgan_generate(params, state, z, training=True)
    assert gfv.shape == (8, 128)
    assert float(jnp.max(jnp.abs(gfv))) <= 1.0  # tanh range
    score, new_state = lg.lgan_discriminate(params, state, gfv, training=True,
                                            dropout_key=key)
    assert score.shape == (8, 1)
    # training advances the spectral-norm power iteration
    old_u = state["discriminator"]["layers"][0]["sn"]["u"]
    new_u = new_state["discriminator"]["layers"][0]["sn"]["u"]
    assert not np.allclose(np.asarray(old_u), np.asarray(new_u))


def test_td3_agent_update_and_action():
    cfg = rl.TD3Config()
    key = jax.random.PRNGKey(3)
    agent = rl.agent_init(key, cfg)

    s = jax.random.normal(key, (16, 128))
    a, _ = rl.select_action(agent, s, cfg, add_noise=False)
    assert a.shape == (16, 1)
    assert float(jnp.max(jnp.abs(a))) <= 1.0

    # OU-noised batched selection
    ou = rl.ou_init(cfg, (16,))
    a2, new_ou = rl.select_action(agent, s, cfg, key=key, ou_state=ou,
                                  add_noise=True)
    assert a2.shape == (16, 1) and new_ou.shape == (16, 1)
    assert float(jnp.max(jnp.abs(a2))) <= 1.0

    batch = rl.TransitionBatch(
        states=jax.random.normal(key, (64, 128)),
        actions=jnp.clip(jax.random.normal(key, (64, 1)), -1, 1),
        rewards=jax.random.normal(key, (64, 1)),
        next_states=jax.random.normal(key, (64, 128)),
        dones=jnp.zeros((64, 1)),
    )
    update = jax.jit(rl.agent_update, static_argnames="cfg")
    agent1, m1 = update(agent, batch, key, cfg=cfg)
    assert int(agent1["step"]) == 1
    assert np.isfinite(float(m1["critic_loss"]))
    # step 1: policy_delay=2 -> no actor update
    np.testing.assert_array_equal(
        np.asarray(agent1["actor"]["params"]["mlp"][0]["dense"]["w"]),
        np.asarray(agent["actor"]["params"]["mlp"][0]["dense"]["w"]))
    # step 2: actor updates + targets soft-update
    agent2, m2 = update(agent1, batch, key, cfg=cfg)
    assert not np.allclose(
        np.asarray(agent2["actor"]["params"]["mlp"][0]["dense"]["w"]),
        np.asarray(agent1["actor"]["params"]["mlp"][0]["dense"]["w"]))
    assert not np.allclose(
        np.asarray(agent2["actor_target"]["params"]["mlp"][0]["dense"]["w"]),
        np.asarray(agent1["actor_target"]["params"]["mlp"][0]["dense"]["w"]))
    assert float(m2["actor_loss"]) != 0.0
    # critics always update
    assert not np.allclose(
        np.asarray(agent2["critic1"]["params"]["out_fc"]["w"]),
        np.asarray(agent1["critic1"]["params"]["out_fc"]["w"]))


def test_composite_complete_and_forward():
    config = Config()
    key = jax.random.PRNGKey(4)
    model = net.init_model(key, config)
    pc = jax.random.normal(key, (2, 2048, 3))

    f = jax.jit(lambda m, x: net.complete(m, x, cfg=config.td3_config()))
    out = f(model, pc)
    assert out["completed_pc"].shape == (2, 2048, 3)
    assert out["hybrid_output"].shape == (2, 2048, 3)
    assert out["z_vector"].shape == (2, 1)
    # hybrid output equals completed or ae_reconstruction per sample
    for i in range(2):
        h = np.asarray(out["hybrid_output"][i])
        c = np.asarray(out["completed_pc"][i])
        r = np.asarray(out["ae_reconstruction"][i])
        assert np.allclose(h, c) or np.allclose(h, r)

    res_ae = net.forward(model, pc, phase="autoencoder", mode="training")
    assert set(res_ae) == {"noisy_gfv", "ae_reconstruction"}
    res_lgan = net.forward(model, pc, phase="lgan", mode="training", key=key)
    assert res_lgan["clean_gfv"].shape == (2, 128)


def test_actor_warmup_delays_policy_updates():
    """cfg.actor_warmup: critics update from step 1 but the actor stays
    frozen until step > warmup (then the usual policy_delay cadence)."""
    cfg = rl.TD3Config(actor_warmup=3, policy_delay=2)
    key = jax.random.PRNGKey(21)
    agent = rl.agent_init(key, cfg)
    batch = rl.TransitionBatch(
        states=jax.random.normal(key, (32, 128)),
        actions=jnp.clip(jax.random.normal(key, (32, 1)), -1, 1),
        rewards=jax.random.normal(key, (32, 1)),
        next_states=jax.random.normal(key, (32, 128)),
        dones=jnp.zeros((32, 1)),
    )
    update = jax.jit(rl.agent_update, static_argnames="cfg")
    w0 = np.asarray(agent["actor"]["params"]["mlp"][0]["dense"]["w"]).copy()
    c0 = np.asarray(agent["critic1"]["params"]["state_fc"]["w"]).copy()
    for step in range(1, 5):
        agent, _ = update(agent, batch, jax.random.fold_in(key, step),
                          cfg=cfg)
        w = np.asarray(agent["actor"]["params"]["mlp"][0]["dense"]["w"])
        if step <= 3:  # warmup (and step 4 is the first eligible even step)
            np.testing.assert_array_equal(w, w0)
        else:
            assert not np.array_equal(w, w0), step
    # critics were never frozen
    assert not np.array_equal(
        np.asarray(agent["critic1"]["params"]["state_fc"]["w"]), c0)


def test_actor_lr_ramp_scales_early_updates():
    """cfg.actor_lr_ramp: the first applied policy update moves the actor
    by ~1/ramp of the constant-lr step (Adam normalises magnitudes, so
    compare update norms directly); the ramp counter advances only on
    applied updates and reaches full rate after `ramp` of them."""
    key = jax.random.PRNGKey(22)
    batch = rl.TransitionBatch(
        states=jax.random.normal(key, (32, 128)),
        actions=jnp.clip(jax.random.normal(key, (32, 1)), -1, 1),
        rewards=jax.random.normal(key, (32, 1)),
        next_states=jax.random.normal(key, (32, 128)),
        dones=jnp.zeros((32, 1)),
    )
    update = jax.jit(rl.agent_update, static_argnames="cfg")

    def first_update_norm(cfg):
        agent = rl.agent_init(jax.random.PRNGKey(23), cfg)
        w0 = np.asarray(
            agent["actor"]["params"]["mlp"][0]["dense"]["w"]).copy()
        for step in range(1, 3):  # policy_delay=2 -> update fires at step 2
            agent, _ = update(agent, batch,
                              jax.random.fold_in(key, step), cfg=cfg)
        w = np.asarray(agent["actor"]["params"]["mlp"][0]["dense"]["w"])
        return np.linalg.norm(w - w0)

    base = first_update_norm(rl.TD3Config(policy_delay=2))
    ramped = first_update_norm(rl.TD3Config(policy_delay=2,
                                            actor_lr_ramp=10))
    assert ramped < base * 0.25, (ramped, base)
    assert ramped > 0.0


def test_gate_modes():
    """model.gate_mode selects which path lands in hybrid_output:
    'rl' = decode(G(z_rl)), 'ae' = plain reconstruction, 'discriminator' =
    the reference's D-score gate (the default, covered above)."""
    config = Config()
    key = jax.random.PRNGKey(14)
    model = net.init_model(key, config)
    pc = jax.random.normal(key, (2, 2048, 3))
    td3 = config.td3_config()

    out_rl = net.complete(model, pc, cfg=td3, gate_mode="rl")
    np.testing.assert_array_equal(np.asarray(out_rl["hybrid_output"]),
                                  np.asarray(out_rl["completed_pc"]))
    assert "rl_gan_score" not in out_rl  # D never evaluated

    out_ae = net.complete(model, pc, cfg=td3, gate_mode="ae")
    np.testing.assert_array_equal(np.asarray(out_ae["hybrid_output"]),
                                  np.asarray(out_ae["ae_reconstruction"]))

    # "union" = per-point fusion: both paths concatenated, 2N points
    out_un = net.complete(model, pc, cfg=td3, gate_mode="union")
    assert out_un["hybrid_output"].shape == (2, 4096, 3)
    np.testing.assert_array_equal(
        np.asarray(out_un["hybrid_output"]),
        np.concatenate([np.asarray(out_un["completed_pc"]),
                        np.asarray(out_un["ae_reconstruction"])], axis=1))
    assert "rl_gan_score" not in out_un  # D never evaluated

    with pytest.raises(ValueError):
        net.complete(model, pc, cfg=td3, gate_mode="nope")

    # engine path honours the same knob
    from gan_rl_3d_tpu.models import inference

    engine = inference.prepare_inference_engine(model)
    fast_rl = inference.complete_fast(engine, pc, gate_mode="rl")
    np.testing.assert_array_equal(np.asarray(fast_rl["hybrid_output"]),
                                  np.asarray(fast_rl["completed_pc"]))
    fast_un = inference.complete_fast(engine, pc, gate_mode="union")
    assert fast_un["hybrid_output"].shape == (2, 4096, 3)
    np.testing.assert_array_equal(
        np.asarray(fast_un["hybrid_output"]),
        np.concatenate([np.asarray(fast_un["completed_pc"]),
                        np.asarray(fast_un["ae_reconstruction"])], axis=1))

    # config validation
    from gan_rl_3d_tpu.config import load_config

    cfg = load_config(overrides={"model": {"gate_mode": "union"}})
    assert cfg.model.gate_mode == "union"
    with pytest.raises(ValueError):
        load_config(overrides={"model": {"gate_mode": "bogus"}})


def test_batched_environment():
    config = Config()
    key = jax.random.PRNGKey(5)
    model = net.init_model(key, config)
    incomplete = jax.random.normal(key, (4, 2048, 3))
    complete_pc = jax.random.normal(jax.random.PRNGKey(6), (4, 2048, 3))

    env = net.env_reset(model, incomplete, complete_pc)
    assert env.state.shape == (4, 128)
    action = jnp.zeros((4, 1))
    env2, rewards, dones, info = net.env_step(model, env, action)
    assert rewards.shape == (4,)
    assert np.all(np.asarray(dones) == 1.0)
    assert np.all(np.isfinite(np.asarray(rewards)))
    assert info["completed_pc"].shape == (4, 2048, 3)
