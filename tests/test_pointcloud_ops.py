"""On-device point-cloud transform tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.ops import pointcloud as pc


def test_normalize_unit_sphere():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32) * 5 + 2)
    y = pc.normalize_unit_sphere(x)
    centroids = np.asarray(jnp.mean(y, axis=1))
    np.testing.assert_allclose(centroids, 0.0, atol=1e-5)
    radii = np.asarray(jnp.max(jnp.linalg.norm(y, axis=-1), axis=1))
    np.testing.assert_allclose(radii, 1.0, rtol=1e-5)


def test_normalize_masked_ignores_padding():
    rng = np.random.RandomState(1)
    real = rng.randn(100, 3).astype(np.float32)
    mask = np.concatenate([np.ones(100), np.zeros(28)]).astype(np.float32)
    padded = np.concatenate([real, np.full((28, 3), 50.0, np.float32)])
    y = pc.normalize_unit_sphere(jnp.asarray(padded), jnp.asarray(mask))
    # valid points must land inside the unit sphere centred at their centroid
    valid = np.asarray(y)[:100]
    c = valid.mean(axis=0)
    np.testing.assert_allclose(c, 0.0, atol=1e-5)
    assert np.abs(np.linalg.norm(valid, axis=1).max() - 1.0) < 1e-5


def test_rotation_is_isometry():
    key = jax.random.PRNGKey(0)
    rot = pc.random_rotation_matrix(key)
    r = np.asarray(rot)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, rtol=1e-6)
    x = jnp.asarray(np.random.RandomState(2).randn(64, 3).astype(np.float32))
    y = pc.rotate(x, rot)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=1),
        np.linalg.norm(np.asarray(x), axis=1), rtol=1e-5)


def test_cut_holes_shapes_and_mask():
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.RandomState(3).randn(256, 3).astype(np.float32))
    out, mask = pc.cut_holes(key, x)
    assert out.shape == (256, 3)
    n_keep = int(np.asarray(mask).sum())
    assert 0.5 * 256 <= n_keep <= 0.8 * 256  # ratio 0.2..0.5 removed
    # mask marks a prefix; tail points are repeats of kept points
    m = np.asarray(mask)
    assert (m[:n_keep] == 1).all() and (m[n_keep:] == 0).all()
    kept = np.asarray(out)[:n_keep]
    tail = np.asarray(out)[n_keep:]
    kept_set = {tuple(p) for p in kept}
    assert all(tuple(p) in kept_set for p in tail)
    # every kept point is an original point
    orig = {tuple(p) for p in np.asarray(x)}
    assert all(tuple(p) in orig for p in kept)


def test_cut_holes_severe_ratio_tail_fill():
    # keep fraction < 1/2 needs the multi-pass repeat-padding tail fill
    x = jnp.asarray(np.random.RandomState(7).randn(256, 3).astype(np.float32))
    orig = {tuple(p) for p in np.asarray(x)}
    for seed in range(8):
        out, mask = pc.cut_holes(jax.random.PRNGKey(seed), x,
                                 min_ratio=0.5, max_ratio=0.8)
        m = np.asarray(mask)
        n_keep = int(m.sum())
        assert 0.2 * 256 <= n_keep <= 0.5 * 256 + 1
        assert (m[:n_keep] == 1).all() and (m[n_keep:] == 0).all()
        kept = np.asarray(out)[:n_keep]
        kept_set = {tuple(p) for p in kept}
        # every kept point is an original point and EVERY tail slot is a
        # repeat of a kept point (the single-roll fill would leave dropped
        # points in slots >= 2*n_keep)
        assert all(tuple(p) in orig for p in kept)
        assert all(tuple(p) in kept_set for p in np.asarray(out)[n_keep:])


def test_make_training_batch_jits():
    key = jax.random.PRNGKey(4)
    x = jnp.asarray(np.random.RandomState(4).randn(8, 128, 3).astype(np.float32))
    f = jax.jit(lambda k, pc_: pc.make_training_batch(k, pc_))
    complete, incomplete, mask = f(key, x)
    assert complete.shape == (8, 128, 3)
    assert incomplete.shape == (8, 128, 3)
    assert mask.shape == (8, 128)
    assert np.all(np.isfinite(np.asarray(complete)))
    # normalised
    radii = np.asarray(jnp.max(jnp.linalg.norm(complete, axis=-1), axis=1))
    np.testing.assert_allclose(radii, 1.0, rtol=1e-4)


def test_cut_holes_extreme_ratio_full_coverage():
    """max_ratio at the 0.95 validation bound: floor(n*(1-ratio)) can drop
    the keep count below n/(old_fill_passes+1), so the pass bound must be
    computed from the worst-case keep count, not the real-valued fraction
    (n=256, ratio->0.95: n_keep=12, the old ceil(1/0.05)-1=19 passes
    covered only 240/256 slots, leaving hole-region points in the tail)."""
    x = jnp.asarray(np.random.RandomState(11).randn(256, 3).astype(np.float32))
    orig = {tuple(p) for p in np.asarray(x)}
    for seed in range(8):
        # ratio in [0.9493, 0.95) pins n_keep = floor(256*(1-ratio)) = 12,
        # the regime where the old bound covered only 240/256 slots
        out, mask = pc.cut_holes(jax.random.PRNGKey(seed), x,
                                 min_ratio=0.9493, max_ratio=0.95)
        m = np.asarray(mask)
        n_keep = int(m.sum())
        assert n_keep == 12
        kept_set = {tuple(p) for p in np.asarray(out)[:n_keep]}
        assert all(tuple(p) in orig for p in np.asarray(out)[:n_keep])
        # EVERY tail slot must be a repeat of a kept point — no dropped
        # hole-region point may survive into the padded tail
        assert all(tuple(p) in kept_set for p in np.asarray(out)[n_keep:])
