"""Functional NN core tests, including parity vs torch (CPU) layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gan_rl_3d_tpu import nn


def test_dense_matches_torch():
    key = jax.random.PRNGKey(0)
    p = nn.dense_init(key, 16, 32)
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    lin = torch.nn.Linear(16, 32)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    y_jax = nn.dense_apply(p, jnp.asarray(x))
    y_torch = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y_jax), y_torch, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 16), (4, 100, 16)])
def test_batchnorm_matches_torch(shape):
    rng = np.random.RandomState(1)
    x = rng.randn(*shape).astype(np.float32) * 2.0 + 0.5
    params, state = nn.batchnorm_init(16)

    bn = torch.nn.BatchNorm1d(16)
    bn.train()
    # torch BatchNorm1d wants (B, C) or (B, C, N)
    xt = torch.from_numpy(x if x.ndim == 2 else x.transpose(0, 2, 1))
    yt = bn(xt).detach().numpy()
    if x.ndim == 3:
        yt = yt.transpose(0, 2, 1)

    y, new_state = nn.batchnorm_apply(params, state, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    bn.eval()
    yt_eval = bn(xt).detach().numpy()
    if x.ndim == 3:
        yt_eval = yt_eval.transpose(0, 2, 1)
    y_eval, _ = nn.batchnorm_apply(params, new_state, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(y_eval), yt_eval, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 16), (8, 100, 16)])
def test_batchnorm_single_read_grouped_matches_torch(shape):
    """The one-HBM-read grouped BN statistics (nn.bn_stats_mode) must stay
    within torch-parity tolerance of torch's batch stats — same gate the
    default centered mode passes."""
    rng = np.random.RandomState(3)
    x = rng.randn(*shape).astype(np.float32) * 2.0 + 0.5
    params, state = nn.batchnorm_init(16)

    bn = torch.nn.BatchNorm1d(16)
    bn.train()
    xt = torch.from_numpy(x if x.ndim == 2 else x.transpose(0, 2, 1))
    yt = bn(xt).detach().numpy()
    if x.ndim == 3:
        yt = yt.transpose(0, 2, 1)

    with nn.bn_stats_mode("single_read_grouped"):
        y, new_state = nn.batchnorm_apply(params, state, jnp.asarray(x),
                                          training=True)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batchnorm_grouped_falls_back_when_unaligned():
    """Batch not divisible by _BN_GROUPS must silently use the centered
    path (identical numerics to the default mode)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    params, state = nn.batchnorm_init(16)
    y_ref, st_ref = nn.batchnorm_apply(params, state, x, training=True)
    with nn.bn_stats_mode("single_read_grouped"):
        y, st = nn.batchnorm_apply(params, state, x, training=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(st["var"]),
                                  np.asarray(st_ref["var"]))


def test_bn_stats_mode_rejects_unknown():
    with pytest.raises(ValueError):
        with nn.bn_stats_mode("bogus"):
            pass


def test_layernorm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 16).astype(np.float32)
    params = nn.layernorm_init(16)
    ln = torch.nn.LayerNorm(16)
    yt = ln(torch.from_numpy(x)).detach().numpy()
    y = nn.layernorm_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_spectral_norm_matches_torch():
    rng = np.random.RandomState(3)
    w_torch = rng.randn(32, 16).astype(np.float32)  # torch layout (out, in)
    lin = torch.nn.Linear(16, 32, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w_torch))
    sn = torch.nn.utils.spectral_norm(lin)

    w = jnp.asarray(w_torch.T)  # our layout (in, out)
    # .copy() matters: torch mutates these buffers in place during forward,
    # and JAX CPU arrays can alias numpy views zero-copy
    state = {
        "u": jnp.asarray(sn.weight_u.detach().numpy().copy()),
        "v": jnp.asarray(sn.weight_v.detach().numpy().copy()),
    }
    x = rng.randn(4, 16).astype(np.float32)
    # one training forward: torch runs a power iteration then normalises
    yt = sn(torch.from_numpy(x)).detach().numpy()
    w_bar, new_state = nn.spectral_norm_apply(w, state, training=True)
    y = jnp.asarray(x) @ w_bar
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["u"]),
                               sn.weight_u.detach().numpy(), rtol=1e-4, atol=1e-4)


def test_dropout():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000,))
    y = nn.dropout(key, x, 0.3, training=True)
    kept = np.asarray(y) != 0
    assert 0.6 < kept.mean() < 0.8
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / 0.7, rtol=1e-6)
    y_eval = nn.dropout(key, x, 0.3, training=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))


def test_validate_bn_stats_mesh():
    """single_read_grouped's equivalence guarantee needs every fixed group
    inside one batch shard: data shards must divide _BN_GROUPS=8."""
    for shards in (1, 2, 4, 8):
        nn.validate_bn_stats_mesh("single_read_grouped", shards)
    for shards in (3, 6, 16):
        with pytest.raises(ValueError, match="centered"):
            nn.validate_bn_stats_mesh("single_read_grouped", shards)
    # "centered" is partition-safe on any mesh
    nn.validate_bn_stats_mesh("centered", 16)
