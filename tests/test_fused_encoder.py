"""Fused encoder kernel + folded inference engine vs the reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.config import Config
from gan_rl_3d_tpu.models import autoencoder as ae
from gan_rl_3d_tpu.models import inference
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import encoder_kernel


def test_fold_bn_matches_sequential():
    key = jax.random.PRNGKey(0)
    from gan_rl_3d_tpu import nn
    p = nn.dense_init(key, 16, 32)
    bn_p, bn_s = nn.batchnorm_init(32)
    # non-trivial BN state
    bn_s = {"mean": jnp.linspace(-1, 1, 32), "var": jnp.linspace(0.5, 2, 32)}
    bn_p = {"scale": jnp.linspace(0.9, 1.1, 32),
            "bias": jnp.linspace(-0.1, 0.1, 32)}
    x = jax.random.normal(key, (8, 16))
    y_seq = nn.dense_apply(p, x)
    y_seq, _ = nn.batchnorm_apply(bn_p, bn_s, y_seq, training=False)
    w, b = encoder_kernel.fold_bn(p, bn_p, bn_s)
    y_fold = x @ w + b
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_seq),
                               rtol=1e-5, atol=1e-5)


def test_fused_encoder_matches_reference_path():
    key = jax.random.PRNGKey(1)
    params, state = ae.encoder_init(key)
    pc = jax.random.normal(key, (4, 512, 3))
    mask = jnp.concatenate([jnp.ones((4, 400)), jnp.zeros((4, 112))], axis=1)

    gfv_ref, _ = ae.encoder_apply(params, state, pc, mask, training=False)
    folded = encoder_kernel.fold_encoder_params(params, state)
    gfv_fused = encoder_kernel.encode_fused(pc, folded, mask)
    np.testing.assert_allclose(np.asarray(gfv_fused), np.asarray(gfv_ref),
                               rtol=1e-3, atol=1e-4)


def test_complete_fast_matches_complete_f32():
    config = Config()
    model = net.init_model(jax.random.PRNGKey(2), config)
    pc = jax.random.normal(jax.random.PRNGKey(3), (2, 2048, 3))

    ref = net.complete(model, pc, cfg=config.td3_config())
    engine = inference.prepare_inference_engine(model, dtype=jnp.float32)
    fast = complete_fast = inference.complete_fast(engine, pc,
                                                   dtype=jnp.float32)
    for k in ("noisy_gfv", "z_vector", "clean_gfv", "completed_pc",
              "ae_reconstruction"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(ref[k]),
                                   rtol=1e-3, atol=1e-4), k


def test_complete_fast_bf16_close():
    config = Config()
    model = net.init_model(jax.random.PRNGKey(4), config)
    pc = jax.random.normal(jax.random.PRNGKey(5), (2, 2048, 3))
    ref = net.complete(model, pc, cfg=config.td3_config())
    engine = inference.prepare_inference_engine(model, dtype=jnp.bfloat16)
    fast = inference.complete_fast(engine, pc, dtype=jnp.bfloat16)
    # bf16 keeps the completion within a few 1e-2 of f32 coordinates
    err = np.abs(np.asarray(fast["completed_pc"], np.float32)
                 - np.asarray(ref["completed_pc"]))
    assert err.max() < 0.05, err.max()
    assert np.all(np.isfinite(np.asarray(fast["hybrid_output"],
                                         np.float32)))


def test_int8_encoder_close_to_f32():
    """Static-PTQ int8 encoder (ops.quantize) stays close to the f32 chain:
    the max-pool output is a 128-d GFV whose per-channel error should be a
    small fraction of its dynamic range."""
    key = jax.random.PRNGKey(8)
    params, state = ae.encoder_init(key)
    pc = jax.random.normal(key, (4, 512, 3))
    mask = jnp.concatenate([jnp.ones((4, 400)), jnp.zeros((4, 112))], axis=1)

    from gan_rl_3d_tpu.ops import quantize

    folded = encoder_kernel.fold_encoder_params(params, state)
    qenc = quantize.quantize_encoder(folded["layers"])

    pooled_ref = encoder_kernel.fused_encoder_pool(pc, folded["layers"], mask)
    pooled_xla = quantize.encode_int8_xla(pc, qenc, mask)
    pooled_krn = encoder_kernel.fused_encoder_pool_int8(pc, qenc, mask)

    # kernel and XLA quantized paths agree up to round-at-0.5 boundary
    # flips (a 1-ulp difference in the row scale can flip one int8 level)
    np.testing.assert_allclose(np.asarray(pooled_krn), np.asarray(pooled_xla),
                               rtol=1e-2, atol=1e-3)
    scale = float(np.abs(np.asarray(pooled_ref)).max())
    err = np.abs(np.asarray(pooled_xla) - np.asarray(pooled_ref))
    assert err.max() < 0.02 * scale, (err.max(), scale)

    # unmasked path also works (maskless kernel specialization)
    pooled_nm = encoder_kernel.fused_encoder_pool_int8(pc, qenc)
    assert np.all(np.isfinite(np.asarray(pooled_nm)))


def test_int8_engine_end_to_end():
    """complete_fast with a calibrated engine produces completions close to
    the f32 path and identical hybrid gating behavior shape-wise."""
    config = Config()
    model = net.init_model(jax.random.PRNGKey(9), config)
    pc = jax.random.normal(jax.random.PRNGKey(10), (2, 2048, 3))

    ref = net.complete(model, pc, cfg=config.td3_config())
    engine = inference.prepare_inference_engine(model, dtype=jnp.bfloat16,
                                                quantize_int8=True)
    assert "encoder_q" in engine
    fast = inference.complete_fast(engine, pc, dtype=jnp.bfloat16)
    err = np.abs(np.asarray(fast["completed_pc"], np.float32)
                 - np.asarray(ref["completed_pc"]))
    assert err.max() < 0.1, err.max()
    assert np.all(np.isfinite(np.asarray(fast["hybrid_output"],
                                         np.float32)))


def test_engine_save_load_roundtrip(tmp_path):
    config = Config()
    model = net.init_model(jax.random.PRNGKey(6), config)
    engine = inference.prepare_inference_engine(model, dtype=jnp.float32)
    path = str(tmp_path / "engine.pkl")
    inference.save_engine(path, engine)
    loaded = inference.load_engine(path)
    pc = jax.random.normal(jax.random.PRNGKey(7), (2, 2048, 3))
    out1 = inference.complete_fast(engine, pc, dtype=jnp.float32)
    out2 = inference.complete_fast(loaded, pc, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1["hybrid_output"]),
                               np.asarray(out2["hybrid_output"]),
                               rtol=1e-6)


def test_int8_engine_save_load_roundtrip(tmp_path):
    """The quantized serving artifact (int8 arrays + scale tuples) must
    survive save_engine/load_engine byte-exactly."""
    config = Config()
    model = net.init_model(jax.random.PRNGKey(6), config)
    engine = inference.prepare_inference_engine(model, dtype=jnp.bfloat16,
                                                quantize_int8=True)
    path = str(tmp_path / "engine_q.pkl")
    inference.save_engine(path, engine)
    loaded = inference.load_engine(path)
    assert "encoder_q" in loaded
    pc = jax.random.normal(jax.random.PRNGKey(7), (2, 2048, 3))
    out1 = inference.complete_fast(engine, pc, dtype=jnp.bfloat16)
    out2 = inference.complete_fast(loaded, pc, dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out1["hybrid_output"], np.float32),
        np.asarray(out2["hybrid_output"], np.float32), rtol=1e-6)


def test_complete_fast_gate_mode_validated_without_hybrid():
    """A typo'd gate_mode must fail loudly even when hybrid=False (it used
    to pass silently because validation lived inside the hybrid branch)."""
    config = Config()
    model = net.init_model(jax.random.PRNGKey(6), config)
    engine = inference.prepare_inference_engine(model, dtype=jnp.float32)
    pc = jax.random.normal(jax.random.PRNGKey(7), (2, 2048, 3))
    with pytest.raises(ValueError, match="gate_mode"):
        inference.complete_fast(engine, pc, hybrid=False, gate_mode="rll")
    with pytest.raises(ValueError, match="gate_mode"):
        net.complete(model, pc, hybrid=False, gate_mode="rll")
