"""Model-variant and alternate-dataset tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.data.simple_dataset import PointCloudDataset, collate_fn
from gan_rl_3d_tpu.models import variants


def test_attention_encoder():
    key = jax.random.PRNGKey(0)
    params, state = variants.attention_encoder_init(key)
    pc = jax.random.normal(key, (4, 256, 3))
    gfv, new_state = variants.attention_encoder_apply(params, state, pc,
                                                      training=True)
    assert gfv.shape == (4, 128)
    assert np.all(np.isfinite(np.asarray(gfv)))
    # masked: padded points must not affect the pooled feature
    real = pc[:, :200]
    junk = 50.0 * jnp.ones((4, 56, 3))
    padded = jnp.concatenate([real, junk], axis=1)
    mask = jnp.concatenate([jnp.ones((4, 200)), jnp.zeros((4, 56))], axis=1)
    g_masked, _ = variants.attention_encoder_apply(params, state, padded,
                                                   mask, training=False)
    g_clean, _ = variants.attention_encoder_apply(params, state, real,
                                                  training=False)
    np.testing.assert_allclose(np.asarray(g_masked), np.asarray(g_clean),
                               rtol=1e-4, atol=1e-4)


def test_adaptive_decoder():
    key = jax.random.PRNGKey(1)
    params, state = variants.adaptive_decoder_init(key, max_points=512)
    gfv = jax.random.normal(key, (4, 128))
    pc, new_state = variants.adaptive_decoder_apply(params, state, gfv,
                                                    training=True)
    assert pc.shape == (4, 512, 3)
    pc_small, _ = variants.adaptive_decoder_apply(params, state, gfv,
                                                  num_points=256)
    assert pc_small.shape == (4, 256, 3)
    # jits with static point count
    f = jax.jit(lambda p, s, g: variants.adaptive_decoder_apply(
        p, s, g, num_points=128)[0])
    assert f(params, state, gfv).shape == (4, 128, 3)


def test_simple_dataset_and_collate():
    ds = PointCloudDataset("/nonexistent", split="test", num_points=128,
                           n_synthetic=30)
    assert len(ds) == 6
    item = ds[0]
    assert item["complete"].shape == (128, 3)
    assert item["incomplete"].shape == (128, 3)
    assert item["mask"].shape == (128,)
    n_keep = int(item["mask"].sum())
    assert n_keep == 64  # missing_ratio 0.5
    # tail is repeats of kept points
    kept = {tuple(p) for p in item["incomplete"][:n_keep]}
    assert all(tuple(p) in kept for p in item["incomplete"][n_keep:])
    batch = collate_fn([ds[0], ds[1], ds[2]])
    assert batch["complete"].shape == (3, 128, 3)
    assert batch["mask"].shape == (3, 128)
