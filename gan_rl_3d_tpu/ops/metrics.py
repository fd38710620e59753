"""Evaluation metrics.

The reference config lists chamfer_distance, completion_ratio and
hausdorff_distance (configs/config.yaml:113) but never implements the latter
two, and its README quotes EMD / F-Score numbers with no implementation
(README.md:302-305). Here they are implemented for real so evaluation can
report every configured metric.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.ops.chamfer import chamfer_distance, nearest_min_distances

Array = jax.Array


def hausdorff_distance(a: Array, b: Array) -> Array:
    """Symmetric Hausdorff distance per cloud: max over directed
    max-of-nearest distances. Shapes (B, N, 3), (B, M, 3) -> (B,)."""
    d_ab = nearest_min_distances(a, b)
    d_ba = nearest_min_distances(b, a)
    return jnp.maximum(jnp.max(d_ab, axis=1), jnp.max(d_ba, axis=1))


def f_score(pred: Array, target: Array, threshold: float = 0.01) -> Array:
    """F1 of precision (pred points within tau of target) and recall
    (target points within tau of pred) — the standard completion F-score."""
    d_pt = nearest_min_distances(pred, target)
    d_tp = nearest_min_distances(target, pred)
    precision = jnp.mean((d_pt < threshold).astype(jnp.float32), axis=1)
    recall = jnp.mean((d_tp < threshold).astype(jnp.float32), axis=1)
    return 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-8)


def completion_ratio(pred: Array, target: Array, threshold: float = 0.03) -> Array:
    """Fraction of ground-truth points that have a predicted point within
    ``threshold`` — how much of the shape got covered."""
    d_tp = nearest_min_distances(target, pred)
    return jnp.mean((d_tp < threshold).astype(jnp.float32), axis=1)


def emd_sinkhorn(a: Array, b: Array, *, epsilon: float = 0.002,
                 iters: int = 200, eps_start: float = 0.5) -> Array:
    """Entropy-regularised EMD (Sinkhorn) between clouds of n and m points
    (uniform weights 1/n and 1/m; n == m is the common eval case but not
    required).

    A real (approximate) optimal-transport distance, replacing the
    reference's sort-of-coordinates stand-in (utils/losses.py:78-103).
    Log-domain updates with a geometric epsilon anneal (``eps_start`` ->
    ``epsilon``) for fast convergence at a small final epsilon, then the
    transport plan is rounded onto the feasible polytope (Altschuler et
    al. 2017, Alg. 2) so the returned <P, C> is the cost of a TRUE
    coupling — an upper bound on exact EMD rather than an
    entropy-biased estimate (the previous eps=0.02/50-iter variant
    reported ~0.2 on identical clouds; this one is within a few % of
    scipy's exact assignment, tests/test_losses.py). At the full
    N=2048 eval resolution the defaults measure 4-5% above exact
    linear-assignment EMD on realistic cloud pairs (always from above —
    the rounded plan is feasible). O(N^2) per cloud per iteration,
    eval-only.
    """
    n = a.shape[-2]
    m = b.shape[-2]
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cost = jnp.sqrt(jnp.maximum(
        a2 + jnp.swapaxes(b2, -1, -2)
        - 2.0 * jnp.einsum("...nc,...mc->...nm", a, b), 0.0))
    log_mu = -jnp.log(n) * jnp.ones(cost.shape[:-1])
    log_nu = -jnp.log(m) * jnp.ones(cost.shape[:-2] + cost.shape[-1:])
    f = jnp.zeros_like(log_mu)
    g = jnp.zeros_like(log_nu)
    # geometric anneal reaching the final epsilon at ~2/3 of the budget,
    # leaving the tail to converge at the target temperature
    anneal_iters = max(int(iters * 2 / 3), 1)
    decay = (epsilon / eps_start) ** (1.0 / anneal_iters)

    def body(i, fg):
        f, g = fg
        eps = jnp.maximum(eps_start * decay ** i, epsilon)
        f = eps * (log_mu - jax.nn.logsumexp(
            (g[..., None, :] - cost) / eps, axis=-1))
        g = eps * (log_nu - jax.nn.logsumexp(
            (f[..., :, None] - cost) / eps, axis=-2))
        return f, g

    f, g = jax.lax.fori_loop(0, iters, body, (f, g))
    plan = jnp.exp((f[..., :, None] + g[..., None, :] - cost) / epsilon)
    # Round to the feasible polytope U(mu, nu): scale rows then columns
    # down to their marginals, and distribute the leftover mass as a
    # rank-one correction. Guarantees sum_j P_ij = 1/n, sum_i P_ij = 1/m.
    mu = 1.0 / n
    nu = 1.0 / m
    row = jnp.sum(plan, axis=-1, keepdims=True)
    plan = plan * jnp.minimum(1.0, mu / jnp.maximum(row, 1e-30))
    col = jnp.sum(plan, axis=-2, keepdims=True)
    plan = plan * jnp.minimum(1.0, nu / jnp.maximum(col, 1e-30))
    err_r = mu - jnp.sum(plan, axis=-1)                    # (..., n) >= 0
    err_c = nu - jnp.sum(plan, axis=-2)                    # (..., m) >= 0
    total = jnp.sum(err_r, axis=-1)[..., None, None]
    plan = plan + (err_r[..., :, None] * err_c[..., None, :]
                   / jnp.maximum(total, 1e-30))
    return jnp.sum(plan * cost, axis=(-2, -1))


def evaluate_completion(
    pred: Array,
    target: Array,
    metrics: tuple = ("chamfer_distance", "completion_ratio",
                      "hausdorff_distance"),
    fscore_threshold: float = 0.01,
    completion_threshold: float = 0.03,
    reduce: bool = True,
    fscore_thresholds: tuple = (),
) -> Dict[str, Array]:
    """Metric dict for a completion result: batch means, or per-sample (B,)
    arrays with ``reduce=False`` (so callers can exclude padded rows).
    ``fscore_thresholds`` adds a labeled ``f_score@tau`` sweep next to the
    primary ``f_score`` so a single arbitrary tau can't be misread."""
    out = {}
    if "chamfer_distance" in metrics:
        out["chamfer_distance"] = chamfer_distance(pred, target)
    if "hausdorff_distance" in metrics:
        out["hausdorff_distance"] = hausdorff_distance(pred, target)
    if "completion_ratio" in metrics:
        out["completion_ratio"] = completion_ratio(pred, target,
                                                   completion_threshold)
    if "f_score" in metrics:
        out["f_score"] = f_score(pred, target, fscore_threshold)
        for tau in fscore_thresholds:
            out[f"f_score@{tau:g}"] = (
                out["f_score"] if tau == fscore_threshold
                else f_score(pred, target, tau))
    if "emd" in metrics:
        out["emd"] = emd_sinkhorn(pred, target)
    if reduce:
        out = {k: jnp.mean(v) for k, v in out.items()}
    return out
