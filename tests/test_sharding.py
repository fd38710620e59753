"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.parallel import mesh as mesh_lib
from gan_rl_3d_tpu.train import steps

N_POINTS = 256
OVERRIDES = {
    "model": {"autoencoder": {"num_points": N_POINTS,
                              "decoder_dims": [256, 256, N_POINTS * 3]}},
}


def test_mesh_construction():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    m = mesh_lib.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_lib.make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_ae_step_dp8_matches_single_device():
    """The sharded AE train step must produce numerically identical results
    to the unsharded one (same program, different partitioning)."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 10)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (16, N_POINTS, 3)),
             "pad": jnp.zeros((16,))}

    def run_steps(p, s, o, b, n=3):
        losses = []
        for i in range(n):
            p, s, o, m = steps.ae_train_step(p, s, o, b,
                                             jax.random.fold_in(key, i),
                                             optimizer=opt, augment=False)
            losses.append(float(m["loss"]))
        return p, losses

    # single-device trajectory
    p1, losses1 = run_steps(params, state, opt_state, batch)

    # 8-way data-parallel trajectory
    mesh = mesh_lib.make_mesh()
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    p8, losses8 = run_steps(
        jax.device_put(params, mesh_lib.replicated(mesh)),
        jax.device_put(state, mesh_lib.replicated(mesh)),
        jax.device_put(opt_state, mesh_lib.replicated(mesh)),
        sharded_batch)

    # loss trajectories must agree step for step (a missing grad all-reduce
    # would diverge by O(1) immediately)
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    # params agree up to reduction-order noise through Adam's rsqrt; real
    # sync bugs produce O(1e-1) divergence
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_ae_step_dp8_matches_single_device_single_read_bn():
    """The shard-aligned single-read BN statistics (bn_stats=
    "single_read_grouped") must preserve the same sharded-vs-single-device
    trajectory equivalence the centered default guarantees — this is the
    property that killed the three naive single-read variants
    (docs/PERF.md #7); the grouped+compensated form is built to pass it."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 10)
    params = model["ae"]["params"]
    state = model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (16, N_POINTS, 3)),
             "pad": jnp.zeros((16,))}

    def run_steps(p, s, o, b, n=3):
        losses = []
        for i in range(n):
            p, s, o, m = steps.ae_train_step(
                p, s, o, b, jax.random.fold_in(key, i), optimizer=opt,
                augment=False, bn_stats="single_read_grouped")
            losses.append(float(m["loss"]))
        return p, losses

    p1, losses1 = run_steps(params, state, opt_state, batch)
    mesh = mesh_lib.make_mesh()
    p8, losses8 = run_steps(
        jax.device_put(params, mesh_lib.replicated(mesh)),
        jax.device_put(state, mesh_lib.replicated(mesh)),
        jax.device_put(opt_state, mesh_lib.replicated(mesh)),
        mesh_lib.shard_batch(mesh, batch))

    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_tensor_parallel_placement():
    """With a model axis, big kernels shard along it."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    placed = mesh_lib.shard_model_for_mesh(mesh, model)
    # decoder final kernel (256 x N*3) should be model-sharded
    w = placed["ae"]["params"]["decoder"]["mlp"][2]["dense"]["w"]
    spec = w.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model"), spec
    # small kernels replicated
    w0 = placed["ae"]["params"]["encoder"]["point_mlp"][0]["dense"]["w"]
    assert w0.sharding.spec == jax.sharding.PartitionSpec(), w0.sharding.spec


def test_complete_runs_sharded():
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    mesh = mesh_lib.make_mesh()
    model = mesh_lib.shard_model_for_mesh(mesh, model)
    pc = mesh_lib.shard_batch(
        mesh, jax.random.normal(jax.random.PRNGKey(2), (16, N_POINTS, 3)))
    out = jax.jit(lambda m, x: net.complete(m, x, cfg=config.td3_config()))(
        model, pc)
    assert out["hybrid_output"].shape == (16, N_POINTS, 3)
    assert np.all(np.isfinite(np.asarray(out["hybrid_output"])))


def test_engine_serving_dp8_matches_single_device():
    """The deployment engine (models.inference.complete_fast) under 8-way
    data-parallel serving: replicated folded weights + batch sharded along
    "data" must reproduce the single-device outputs exactly (same program,
    different partitioning) — the multi-chip serving configuration."""
    from gan_rl_3d_tpu.models import inference

    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    engine = inference.prepare_inference_engine(model)
    pc = jax.random.normal(jax.random.PRNGKey(3), (16, N_POINTS, 3))

    fn = jax.jit(inference.complete_fast)
    out1 = fn(engine, pc)

    mesh = mesh_lib.make_mesh()
    eng8 = jax.device_put(engine, mesh_lib.replicated(mesh))
    pc8 = mesh_lib.shard_batch(mesh, pc)
    out8 = fn(eng8, pc8)
    np.testing.assert_allclose(np.asarray(out8["hybrid_output"]),
                               np.asarray(out1["hybrid_output"]),
                               rtol=1e-5, atol=1e-5)


def test_resident_epoch_preserves_data_parallelism():
    """The resident-data epoch scan must shard gathered batches along the
    data axis (not silently replicate the work) and match the unsharded
    result numerically."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 4)
    params, state = model["ae"]["params"], model["ae"]["state"]
    key = jax.random.PRNGKey(9)
    data = jax.random.normal(key, (64, N_POINTS, 3))
    order = jnp.arange(32).reshape(2, 16)
    pads = jnp.zeros((2, 16))

    p1, s1, o1, m1 = steps.ae_train_epoch_resident(
        params, state, opt.init(params), data, order, pads, key,
        optimizer=opt, augment=False)

    mesh = mesh_lib.make_mesh()
    data_dev = jax.device_put(data, mesh_lib.replicated(mesh))
    p8, s8, o8, m8 = steps.ae_train_epoch_resident(
        jax.device_put(params, mesh_lib.replicated(mesh)),
        jax.device_put(state, mesh_lib.replicated(mesh)),
        jax.device_put(opt.init(params), mesh_lib.replicated(mesh)),
        data_dev, order, pads, key, optimizer=opt, augment=False,
        batch_sharding=mesh_lib.batch_sharding(mesh))
    np.testing.assert_allclose(np.asarray(m8["losses"]),
                               np.asarray(m1["losses"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_lgan_combined_step_dp8_matches_single_device():
    """The fused WGAN-GP step (double-grad gradient penalty, spectral-norm
    power iteration, d_steps scan) under 8-way DP must match single-device
    numerics — the riskiest GSPMD compile path in the framework."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    cfg = config.training.lgan
    d_opt = steps.make_gan_optimizer(cfg.discriminator_lr, cfg)
    g_opt = steps.make_gan_optimizer(cfg.generator_lr, cfg)
    lp, ls = model["lgan"]["params"], model["lgan"]["state"]
    d_steps, bs = 2, 16
    key = jax.random.PRNGKey(3)
    real = jax.random.normal(key, (d_steps, bs, 128))

    def run(lp, ls, real, n=2):
        d_o = d_opt.init(lp["discriminator"])
        g_o = g_opt.init(lp["generator"])
        traj = []
        for i in range(n):
            lp, ls, d_o, g_o, m = steps.lgan_combined_step(
                lp, ls, d_o, g_o, real, jax.random.fold_in(key, i),
                d_opt=d_opt, g_opt=g_opt, lambda_gp=cfg.lambda_gp,
                z_dim=config.model.lgan.z_dim, d_steps=d_steps)
            traj.append((float(m["d_loss"]), float(m["g_loss"])))
        return lp, traj

    p1, t1 = run(lp, ls, real)

    mesh = mesh_lib.make_mesh()
    real8 = jax.device_put(real, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")))
    p8, t8 = run(jax.device_put(lp, mesh_lib.replicated(mesh)),
                 jax.device_put(ls, mesh_lib.replicated(mesh)), real8)

    np.testing.assert_allclose(t8, t1, rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_rl_step_dp8_matches_single_device():
    """rl_step (vmapped env + ring buffer + lax.cond-gated TD3 update)
    under 8-way DP must reproduce the single-device trajectory."""
    from gan_rl_3d_tpu.models import rl_agent as rl
    from gan_rl_3d_tpu.train import replay_buffer as rb

    config = load_config(None, overrides={
        **OVERRIDES,
        "model": {**OVERRIDES["model"],
                  "rl_agent": {"batch_size": 16, "buffer_size": 256}},
    })
    td3 = config.td3_config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    key = jax.random.PRNGKey(7)
    bs = 16
    batches = [
        {"complete_pc": jax.random.normal(jax.random.fold_in(key, i),
                                          (bs, N_POINTS, 3)),
         "pad": jnp.zeros((bs,))}
        for i in range(3)
    ]

    def run(m, put):
        buffer = rb.buffer_init(256, td3.state_dim, td3.action_dim)
        ou = rl.ou_init(td3, (bs,))
        rewards = []
        for i, b in enumerate(batches):
            m, buffer, ou, metrics = steps.rl_step(
                m, buffer, ou, put(b), jax.random.fold_in(key, 100 + i),
                cfg=td3, start_training_size=bs)
            rewards.append(float(metrics["reward"]))
        return m, buffer, rewards

    m1, buf1, r1 = run(model, lambda b: b)

    mesh = mesh_lib.make_mesh()
    m8, buf8, r8 = run(jax.device_put(model, mesh_lib.replicated(mesh)),
                       lambda b: mesh_lib.shard_batch(mesh, b))

    np.testing.assert_allclose(r8, r1, rtol=2e-4, atol=1e-5)
    assert int(buf8.size) == int(buf1.size) == 48
    for a, b in zip(jax.tree.leaves(m1["agent"]), jax.tree.leaves(m8["agent"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_joint_step_tp4x2_matches_single_device():
    """One joint fine-tune step on a 4x2 (data x model) mesh — decoder head
    and wide GAN layers tensor-sharded — must match the 1-device result."""
    config = load_config(None, overrides=OVERRIDES)
    td3 = config.td3_config()
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_joint_optimizer(config.training.joint)
    key = jax.random.PRNGKey(11)
    batch = {"complete_pc": jax.random.normal(key, (16, N_POINTS, 3)),
             "pad": jnp.zeros((16,))}

    def run(m, b):
        o = opt.init({"ae": m["ae"]["params"],
                      "gen": m["lgan"]["params"]["generator"]})
        m, o, metrics = steps.joint_train_step(
            m, o, b, key, optimizer=opt, cfg=td3)
        return m, float(metrics["loss"])

    m1, loss1 = run(model, batch)

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    m_tp = mesh_lib.shard_model_for_mesh(mesh, model)
    # sanity: the TP placement actually sharded something on this mesh
    dec_w = m_tp["ae"]["params"]["decoder"]["mlp"][2]["dense"]["w"]
    assert dec_w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    m2, loss2 = run(m_tp, mesh_lib.shard_batch(mesh, batch))

    np.testing.assert_allclose(loss2, loss1, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(m1["ae"]["params"]),
                    jax.tree.leaves(m2["ae"]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_process_local_slice_arithmetic():
    """Per-process shard arithmetic for multi-host feeding: contiguous,
    disjoint, covering, and rejecting uneven splits."""
    import pytest

    slices = [mesh_lib.process_local_slice(64, p, 4) for p in range(4)]
    rows = np.arange(64)
    chunks = [rows[s] for s in slices]
    assert all(len(c) == 16 for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks), rows)
    with pytest.raises(ValueError, match="divide evenly"):
        mesh_lib.process_local_slice(30, 0, 4)
    # defaults read the live process topology (single process here)
    s = mesh_lib.process_local_slice(8)
    assert (s.start, s.stop) == (0, 8)


def test_shard_batch_process_local_matches_global():
    """Single-process, process_local feeding must build the identical
    global sharded array the plain path builds (the degenerate case the
    multi-host path reduces to; docs/SCALING.md 'Extending beyond one
    host')."""
    mesh = mesh_lib.make_mesh()
    batch = {"complete_pc": np.random.RandomState(0)
             .randn(16, N_POINTS, 3).astype(np.float32),
             "pad": np.zeros((16,), np.float32)}
    local = {k: v[mesh_lib.process_local_slice(16)]
             for k, v in batch.items()}
    a = mesh_lib.shard_batch(mesh, batch)
    b = mesh_lib.shard_batch(mesh, local, process_local=True)
    for k in batch:
        assert b[k].sharding.is_equivalent_to(a[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def _ae_equivalence_on_mesh(mesh, *, bn_stats="centered", loss_rtol=1e-4):
    """Shared body: AE-step trajectory on ``mesh`` must match the
    single-device trajectory (same program, different partitioning).
    ``loss_rtol`` is loosened for tensor-parallel meshes, where sharded
    matmul reduction order adds per-step noise that compounds through
    Adam's rsqrt (real sync bugs diverge O(1), so still caught)."""
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 10)
    params, state = model["ae"]["params"], model["ae"]["state"]
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    batch = {"complete_pc": jax.random.normal(key, (16, N_POINTS, 3)),
             "pad": jnp.zeros((16,))}

    def run_steps(p, s, o, b, n=3):
        losses = []
        for i in range(n):
            p, s, o, m = steps.ae_train_step(p, s, o, b,
                                             jax.random.fold_in(key, i),
                                             optimizer=opt, augment=False,
                                             bn_stats=bn_stats)
            losses.append(float(m["loss"]))
        return p, losses

    p1, losses1 = run_steps(params, state, opt_state, batch)
    # tensor-parallel placement for the params (a no-op on model=1 meshes)
    sharded = mesh_lib.shard_model_for_mesh(mesh, {"ae": {"params": params,
                                                          "state": state}})
    pN, lossesN = run_steps(
        sharded["ae"]["params"], sharded["ae"]["state"],
        jax.device_put(opt_state, mesh_lib.replicated(mesh)),
        mesh_lib.shard_batch(mesh, batch))
    np.testing.assert_allclose(lossesN, losses1, rtol=loss_rtol)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_ae_step_mesh_2x4_matches_single_device():
    """Model-heavy 2x4 mesh: 2 data shards + 4-way tensor parallelism on
    the decoder head. Equivalence must hold for both BN-stat policies
    (2 data shards divide _BN_GROUPS=8, so grouped is legal here)."""
    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    _ae_equivalence_on_mesh(mesh, loss_rtol=2e-3)
    _ae_equivalence_on_mesh(mesh, bn_stats="single_read_grouped",
                            loss_rtol=2e-3)


def test_bn_mesh_guard_rejects_16_data_shards():
    """validate_bn_stats_mesh must reject single_read_grouped whenever the
    data axis does not divide the fixed 8 BN groups, and accept centered
    on any mesh (docs/PERF.md #7)."""
    import pytest

    from gan_rl_3d_tpu import nn

    for shards in (1, 2, 4, 8):
        nn.validate_bn_stats_mesh("single_read_grouped", shards)
    for shards in (6, 16, 32):
        with pytest.raises(ValueError, match="single_read_grouped"):
            nn.validate_bn_stats_mesh("single_read_grouped", shards)
        nn.validate_bn_stats_mesh("centered", shards)  # always legal


def test_centered_fallback_trains_equivalently_on_16_devices():
    """End-to-end 16-virtual-device case (VERDICT r3 weak #6): a 16x1 mesh
    rejects single_read_grouped, and the centered fallback preserves the
    sharded-vs-single-device trajectory equivalence. Needs 16 devices ->
    runs in a subprocess with its own forced-CPU 16-device platform."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import sys
        sys.path.insert(0, %r)
        import tests.test_sharding as ts
        from gan_rl_3d_tpu.parallel import mesh as mesh_lib
        assert jax.device_count() == 16
        mesh = mesh_lib.make_mesh()  # defaults to all devices on "data"
        assert dict(mesh.shape) == {"data": 16, "model": 1}
        # 16 shards = 1 row per device: centered BN's reduction-order
        # noise is larger than at 8-way (the documented centered-vs-
        # grouped partition-invariance gap, docs/PERF.md #7) and
        # compounds through Adam; step 1 still matches to 7 digits.
        ts._ae_equivalence_on_mesh(mesh, bn_stats="centered",
                                   loss_rtol=1e-2)
        print("16-device centered equivalence ok")
    """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        .replace("--xla_force_host_platform_device_count=8",
                                 "")
                        + " --xla_force_host_platform_device_count=16")
    p = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr}"
    assert "16-device centered equivalence ok" in p.stdout


def test_grouped_epoch_plan_is_shard_aligned():
    """BatchLoader(shard_groups=G) must (a) cover every row exactly once
    across the epoch's non-pad slots and (b) keep slot group g's draws
    inside row group g — the invariant steps._resident_gather's local
    take relies on."""
    from gan_rl_3d_tpu.data.dataset import BatchLoader

    class _FakeDS:
        def __len__(self):
            return 48

    G, bs = 8, 16
    loader = BatchLoader(_FakeDS(), bs, shuffle=True, seed=3, shard_groups=G)
    idx, pad = loader.epoch_indices()
    assert idx.shape == (3, bs) and pad.shape == (3, bs)
    real = idx[pad == 0]
    assert sorted(real.tolist()) == list(range(48))
    m, spg = 48 // G, bs // G
    for g in range(G):
        draws = idx[:, g * spg:(g + 1) * spg]
        assert draws.min() >= g * m and draws.max() < (g + 1) * m
    # misaligned sizes fall back to the unconstrained permutation
    loader_bad = BatchLoader(_FakeDS(), 12, shuffle=True, seed=3,
                             shard_groups=G)
    idx_b, pad_b = loader_bad.epoch_indices()
    assert sorted(idx_b[pad_b == 0].tolist()) == list(range(48))


def test_sharded_residency_matches_replicated():
    """training.data_residency="sharded": row-sharded resident data + the
    shard_map local gather must reproduce the replicated-residency
    trajectory exactly (same grouped plan, different placement)."""
    from gan_rl_3d_tpu.data.dataset import BatchLoader

    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    opt = steps.make_ae_optimizer(config.training.autoencoder, 4)
    params, state = model["ae"]["params"], model["ae"]["state"]
    key = jax.random.PRNGKey(9)
    data = jax.random.normal(key, (64, N_POINTS, 3))

    class _FakeDS:
        def __len__(self):
            return 64

    loader = BatchLoader(_FakeDS(), 16, shuffle=True, seed=5,
                         shard_groups=mesh_lib.DATA_SHARD_GROUPS)
    order, pads = loader.epoch_indices()
    order, pads = jnp.asarray(order), jnp.asarray(pads)
    mesh = mesh_lib.make_mesh()
    bsh = mesh_lib.batch_sharding(mesh)

    def run(data_dev, data_sharded):
        return steps.ae_train_epoch_resident(
            jax.device_put(params, mesh_lib.replicated(mesh)),
            jax.device_put(state, mesh_lib.replicated(mesh)),
            jax.device_put(opt.init(params), mesh_lib.replicated(mesh)),
            data_dev, order, pads, key, optimizer=opt, augment=False,
            batch_sharding=bsh, data_sharded=data_sharded)

    p_rep, _, _, m_rep = run(
        jax.device_put(data, mesh_lib.replicated(mesh)), False)
    p_sh, _, _, m_sh = run(
        jax.device_put(data, mesh_lib.row_sharding(mesh)), True)
    np.testing.assert_allclose(np.asarray(m_sh["losses"]),
                               np.asarray(m_rep["losses"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_rep), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
