"""Loss / reward / metric tests, including WGAN-GP double-grad."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.ops import losses, metrics


def test_gfv_loss_is_mse():
    a = jnp.asarray(np.random.RandomState(0).randn(4, 128).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).randn(4, 128).astype(np.float32))
    np.testing.assert_allclose(
        float(losses.gfv_loss(a, b)),
        np.mean((np.asarray(a) - np.asarray(b)) ** 2), rtol=1e-6)


def test_wgan_losses():
    real = jnp.asarray([1.0, 2.0, 3.0])
    fake = jnp.asarray([0.5, 0.5, 0.5])
    d = losses.discriminator_loss(real, fake)
    np.testing.assert_allclose(float(d), 0.5 - 2.0, rtol=1e-6)
    g = losses.generator_loss(fake)
    np.testing.assert_allclose(float(g), -0.5, rtol=1e-6)


def test_gradient_penalty_linear_disc():
    """For D(x) = w.x the GP has a closed form: lambda*(||w|| - 1)^2."""
    key = jax.random.PRNGKey(0)
    w = jnp.asarray(np.random.RandomState(2).randn(128).astype(np.float32))

    def disc(x):
        return x @ w

    real = jnp.asarray(np.random.RandomState(3).randn(16, 128).astype(np.float32))
    fake = jnp.asarray(np.random.RandomState(4).randn(16, 128).astype(np.float32))
    gp = losses.gradient_penalty(disc, key, real, fake, lambda_gp=10.0)
    expected = 10.0 * (np.linalg.norm(np.asarray(w)) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


def test_gradient_penalty_double_grad():
    """The GP must itself be differentiable w.r.t. D's params (the WGAN-GP
    discriminator step differentiates through jax.grad)."""
    key = jax.random.PRNGKey(1)
    real = jnp.asarray(np.random.RandomState(5).randn(8, 16).astype(np.float32))
    fake = jnp.asarray(np.random.RandomState(6).randn(8, 16).astype(np.float32))

    def loss_of_w(w):
        return losses.gradient_penalty(lambda x: jnp.tanh(x @ w), key, real, fake)

    w0 = jnp.asarray(np.random.RandomState(7).randn(16).astype(np.float32))
    g = jax.grad(loss_of_w)(w0)
    assert g.shape == (16,)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_reward_sign_and_batched_consistency():
    rng = np.random.RandomState(8)
    pred = jnp.asarray(rng.randn(4, 64, 3).astype(np.float32))
    target = jnp.asarray(rng.randn(4, 64, 3).astype(np.float32))
    pgfv = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    tgfv = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    d_out = jnp.asarray(rng.randn(4, 1).astype(np.float32))

    r_scalar = losses.completion_reward(pred, target, pgfv, tgfv, d_out)
    r_batch = losses.completion_reward_batched(pred, target, pgfv, tgfv, d_out)
    assert r_batch.shape == (4,)
    np.testing.assert_allclose(float(jnp.mean(r_batch)), float(r_scalar),
                               rtol=1e-5)
    # perfect completion with high D score must beat a bad one
    r_good = losses.completion_reward(target, target, tgfv, tgfv,
                                      jnp.ones((4, 1)))
    assert float(r_good) > float(r_scalar)


def test_metrics_perfect_prediction():
    rng = np.random.RandomState(9)
    pc = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    out = metrics.evaluate_completion(pc, pc,
                                      metrics=("chamfer_distance",
                                               "completion_ratio",
                                               "hausdorff_distance",
                                               "f_score"))
    assert float(out["chamfer_distance"]) < 1e-3
    # hausdorff is the max over the identity's per-point cancellation noise
    assert float(out["hausdorff_distance"]) < 5e-3
    np.testing.assert_allclose(float(out["completion_ratio"]), 1.0)
    np.testing.assert_allclose(float(out["f_score"]), 1.0)


def test_f_score_threshold_sweep():
    """fscore_thresholds expands into labeled f_score@tau keys, monotone
    non-decreasing in tau, with the primary threshold's entry aliasing
    f_score (no double compute)."""
    rng = np.random.RandomState(11)
    pred = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    target = pred + 0.015 * jnp.asarray(
        rng.randn(2, 128, 3).astype(np.float32))
    out = metrics.evaluate_completion(
        pred, target, metrics=("f_score",), fscore_threshold=0.01,
        fscore_thresholds=(0.01, 0.02, 0.05))
    assert set(out) == {"f_score", "f_score@0.01", "f_score@0.02",
                        "f_score@0.05"}
    np.testing.assert_allclose(float(out["f_score@0.01"]),
                               float(out["f_score"]))
    assert (float(out["f_score@0.01"]) <= float(out["f_score@0.02"])
            <= float(out["f_score@0.05"]))
    assert 0.0 < float(out["f_score@0.01"]) < 1.0  # noise straddles 0.01


def test_emd_sinkhorn_sanity():
    rng = np.random.RandomState(10)
    a = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    shifted = a + jnp.asarray([2.0, 0.0, 0.0])
    emd_same = metrics.emd_sinkhorn(a, a)
    emd_far = metrics.emd_sinkhorn(a, shifted)
    # annealed + feasibility-rounded: identical clouds cost ~0
    assert float(jnp.mean(emd_same)) < 1e-3
    # translation by 2 costs 2 per unit mass (within rounding)
    assert 1.99 < float(jnp.mean(emd_far)) < 2.02
    # reference's sort-based stand-in is exposed for API parity
    v = losses.emd_sorted_approx(a, shifted)
    assert np.isfinite(float(v))


def test_emd_sinkhorn_matches_exact_assignment():
    """The rounded Sinkhorn cost is a feasible-coupling upper bound within
    a few % of scipy's exact linear-assignment EMD (the assignment is an
    extreme point of the coupling polytope, so exact EMD <= our value)."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(11)
    pairs = []
    x = rng.rand(128, 3).astype(np.float32)
    pairs.append(("uniform", x, rng.rand(128, 3).astype(np.float32)))
    pairs.append(("noisy", x, x + 0.03 * rng.randn(128, 3).astype(np.float32)))
    for name, a, b in pairs:
        d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
        r, c = linear_sum_assignment(d)
        exact = d[r, c].mean()
        approx = float(metrics.emd_sinkhorn(jnp.asarray(a[None]),
                                            jnp.asarray(b[None]))[0])
        assert approx >= exact - 1e-4, (name, exact, approx)
        assert approx <= exact * 1.03 + 1e-4, (name, exact, approx)
