"""Chamfer kernel tests: Pallas kernel vs jnp reference vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_rl_3d_tpu.ops import chamfer


def brute_force_chamfer(a, b):
    """O(N*M) numpy reference mirroring torch.cdist + min + mean
    (reference utils/losses.py:13-39)."""
    d = np.linalg.norm(a[:, :, None, :] - b[:, None, :, :], axis=-1)
    d_ab = d.min(axis=2).mean(axis=1)
    d_ba = d.min(axis=1).mean(axis=1)
    return d_ab, d_ba


@pytest.fixture
def clouds():
    rng = np.random.RandomState(0)
    a = rng.randn(2, 256, 3).astype(np.float32)
    b = rng.randn(2, 512, 3).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_jnp_matches_brute_force(clouds):
    a, b = clouds
    d_ab, d_ba = chamfer.chamfer_distance_l2(a, b, use_pallas=False)
    ref_ab, ref_ba = brute_force_chamfer(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(d_ab), ref_ab, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_ba), ref_ba, rtol=1e-5, atol=1e-6)


def test_pallas_matches_jnp(clouds):
    a, b = clouds
    d_ref, i_ref = chamfer.nearest_distances(a, b, use_pallas=False)
    d_pl, i_pl = chamfer.nearest_distances(a, b, use_pallas=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    # argmin ties can differ; distances via the chosen indices must agree
    # exact norms differ from the |a|^2+|b|^2-2ab identity by f32
    # cancellation error, so compare at 1e-3
    chosen = jnp.take_along_axis(b, i_pl[..., None], axis=1)
    d_chosen = jnp.linalg.norm(a - chosen, axis=-1)
    np.testing.assert_allclose(np.asarray(d_chosen), np.asarray(d_ref),
                               rtol=1e-3, atol=1e-3)


def test_pallas_gradients_match_jnp(clouds):
    a, b = clouds

    def loss_pallas(a, b):
        return jnp.mean(chamfer.chamfer_distance(a, b, use_pallas=True))

    def loss_jnp(a, b):
        return jnp.mean(chamfer.chamfer_distance(a, b, use_pallas=False))

    ga_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(a, b)
    ga_j, gb_j = jax.grad(loss_jnp, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_j),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_j),
                               rtol=1e-4, atol=1e-6)


def test_identical_clouds_zero_distance():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    d = chamfer.chamfer_distance(a, a)
    # the |a|^2+|b|^2-2ab identity leaves ~1e-8 residue in d^2 -> ~1e-4 in d
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
    # gradient at the degenerate point must be finite (safe divide)
    g = jax.grad(lambda x: jnp.mean(chamfer.chamfer_distance(x, a)))(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_chamfer_ignores_padding():
    rng = np.random.RandomState(2)
    real = rng.randn(1, 200, 3).astype(np.float32)
    pad = 100.0 * np.ones((1, 56, 3), np.float32)  # far-away junk padding
    padded = jnp.asarray(np.concatenate([real, pad], axis=1))
    mask = jnp.asarray(
        np.concatenate([np.ones((1, 200)), np.zeros((1, 56))], axis=1)
    ).astype(jnp.float32)
    target = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))

    d_masked = chamfer.chamfer_distance(padded, target, a_mask=mask,
                                        b_mask=None)
    d_clean = chamfer.chamfer_distance(jnp.asarray(real), target)
    # masked a-side mean must equal the clean computation's a->b direction;
    # b->a direction also matches because junk points are never nearest
    # ... unless they are (they're at distance ~100, never nearest). But
    # b->a can pick junk as nearest? junk is far from everything, so no.
    np.testing.assert_allclose(np.asarray(d_masked), np.asarray(d_clean),
                               rtol=1e-4)


def test_chamfer_in_jit_and_vmap(clouds):
    a, b = clouds
    jitted = jax.jit(lambda x, y: chamfer.chamfer_distance(x, y))
    d = jitted(a, b)
    assert d.shape == (2,)
    assert np.all(np.isfinite(np.asarray(d)))


def test_masked_pallas_matches_masked_jnp():
    """b-side masking runs through the Pallas kernel (folded into the
    column norms) and must match the jnp masked reference, values and
    gradients."""
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
    b_mask = jnp.asarray((rng.rand(2, 512) > 0.4).astype(np.float32))

    d_pl, i_pl = chamfer.nearest_distances(a, b, b_mask=b_mask,
                                           use_pallas=True)
    d_j, i_j = chamfer.nearest_distances(a, b, b_mask=b_mask,
                                         use_pallas=False)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_j),
                               rtol=1e-4, atol=1e-5)
    # selected indices must always be valid points
    sel_valid = np.take_along_axis(np.asarray(b_mask), np.asarray(i_pl),
                                   axis=1)
    assert (sel_valid > 0).all()

    def loss(fn_flag):
        return lambda x, y: jnp.mean(chamfer.chamfer_distance(
            x, y, b_mask=b_mask, use_pallas=fn_flag))

    ga_p, gb_p = jax.grad(loss(True), argnums=(0, 1))(a, b)
    ga_j, gb_j = jax.grad(loss(False), argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_j),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_j),
                               rtol=1e-3, atol=1e-5)
    # masked b points receive zero gradient
    gb = np.asarray(gb_p)
    masked_rows = np.asarray(b_mask) == 0
    np.testing.assert_allclose(gb[masked_rows], 0.0, atol=1e-7)
