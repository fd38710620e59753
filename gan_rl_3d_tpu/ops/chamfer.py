"""Chamfer distance for point clouds, TPU-first.

The reference computes Chamfer via a materialised (B, N, M) `torch.cdist`
matrix + min-reduce (reference utils/losses.py:13-39) — its compute hot spot.
Here the pairwise minimum is a tiled Pallas kernel: (TN, TM) squared-distance
tiles are produced on-chip from an MXU matmul plus row/col norms and
min-reduced into a running per-point minimum, so the N*M matrix never touches
HBM. A custom VJP routes gradients through the argmin indices (gather +
scatter-add), avoiding differentiation through the full distance matrix.

A pure-jnp implementation is kept both as the numerical reference for tests
and as the fallback on non-TPU backends (the Pallas kernel also runs under
``interpret=True`` on CPU).

All distances follow the reference convention: *unsquared* Euclidean (L2)
nearest-neighbour distances, averaged per cloud.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30


# ---------------------------------------------------------------------------
# jnp reference implementation
# ---------------------------------------------------------------------------


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """Squared Euclidean distances between two point sets.

    Args:
      a: (..., N, 3)
      b: (..., M, 3)
    Returns:
      (..., N, M) squared distances (clamped at 0 for numerical safety).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    cross = jnp.einsum("...nc,...mc->...nm", a, b)
    d2 = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _nearest_jnp(a: Array, b: Array, b_mask: Optional[Array]) -> Tuple[Array, Array]:
    d2 = pairwise_sqdist(a, b)
    if b_mask is not None:
        d2 = jnp.where(b_mask[..., None, :], d2, _BIG)
    idx = jnp.argmin(d2, axis=-1)
    dmin = jnp.min(d2, axis=-1)
    # clamp before sqrt: at dmin == 0 the true gradient is 0 (the (a - b)
    # factor vanishes), but sqrt'(0) = inf would turn it into NaN
    return jnp.sqrt(jnp.maximum(dmin, 1e-12)), idx


# ---------------------------------------------------------------------------
# Pallas kernel: per-point nearest-neighbour distance (forward)
# ---------------------------------------------------------------------------


def _nn_kernel(a_ref, b_ref, a2_ref, b2_ref, dmin_ref, idx_ref):
    """Grid (B, N/TN, M/TM); running min over the M tiles (innermost axis).

    Block shapes: a (1, TN, 3), b (1, TM, 3), a2 (1, TN, 1), b2 (1, 1, TM);
    outputs dmin (1, TN) and idx (1, TN) revisited across the M axis.
    """
    mi = pl.program_id(2)
    tm = b_ref.shape[1]

    a = a_ref[0]  # (TN, 3) — pre-scaled by -2 so d2 = a2 + b2 + cross
    b = b_ref[0]  # (TM, 3)
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TM) = -2 * <a, b>
    # no per-tile clamp: min is monotone, so clamping the reduced minimum
    # once (at the sqrt) is equivalent and saves a full VPU pass per tile;
    # folding the -2 into the matmul operand saves another
    d2 = (a2_ref[0] + b2_ref[0]) + cross  # same association as before

    tile_min = jnp.min(d2, axis=1)  # (TN,)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + mi * tm  # (TN,)

    @pl.when(mi == 0)
    def _init():
        dmin_ref[0, 0, :] = tile_min
        idx_ref[0, 0, :] = tile_arg

    @pl.when(mi > 0)
    def _accum():
        prev = dmin_ref[0, 0, :]
        better = tile_min < prev
        dmin_ref[0, 0, :] = jnp.where(better, tile_min, prev)
        idx_ref[0, 0, :] = jnp.where(better, tile_arg, idx_ref[0, 0, :])


def _nearest_pallas_fwd(a: Array, b: Array, tn: int, tm: int,
                        interpret: bool,
                        b_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    bsz, n, _ = a.shape
    m = b.shape[1]
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # (B, N, 1)
    b2 = jnp.sum(b * b, axis=-1)[:, None, :]             # (B, 1, M)
    if b_mask is not None:
        # masking folds into the precomputed column norms: d2 = a2+b2-2ab,
        # so inflating b2 for invalid points keeps them from ever being the
        # minimum — the kernel needs no mask awareness at all
        b2 = b2 + (1.0 - b_mask.astype(jnp.float32))[:, None, :] * _BIG
    a_scaled = a * -2.0
    grid = (bsz, pl.cdiv(n, tn), pl.cdiv(m, tm))
    dmin2, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda bi, ni, mi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda bi, ni, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni, mi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm), lambda bi, ni, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda bi, ni, mi: (bi, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda bi, ni, mi: (bi, 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, n), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * m * 4,
            bytes_accessed=4 * bsz * (n * 3 + m * 3 + 2 * n),
            transcendentals=0,
        ),
    )(a_scaled, b, a2, b2)
    # clamp: cancellation can leave d2 slightly negative, and sqrt'(0)=inf
    # would NaN the VJP at exact-zero distances
    return jnp.sqrt(jnp.maximum(dmin2[:, 0, :], 1e-12)), idx[:, 0, :]


# ---------------------------------------------------------------------------
# Pallas kernel: min-only forward (eval/metrics path — skips the argmin
# reduction, ~30% fewer VPU passes)
# ---------------------------------------------------------------------------


def _nn_min_kernel(a_ref, b_ref, a2_ref, b2_ref, dmin_ref):
    mi = pl.program_id(2)
    a = a_ref[0]  # pre-scaled by -2 (see _nn_kernel)
    b = b_ref[0]
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = (a2_ref[0] + b2_ref[0]) + cross
    tile_min = jnp.min(d2, axis=1)

    @pl.when(mi == 0)
    def _init():
        dmin_ref[0, 0, :] = tile_min

    @pl.when(mi > 0)
    def _accum():
        dmin_ref[0, 0, :] = jnp.minimum(dmin_ref[0, 0, :], tile_min)


def nearest_min_distances(a: Array, b: Array, *, tile_n: int = 256,
                          tile_m: int = 2048,
                          use_pallas: Optional[bool] = None) -> Array:
    """Distances only, no neighbour indices — the cheap path for metrics
    and evaluation where no gradient flows."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    bsz, n, _ = a.shape
    m = b.shape[1]
    tn, tm = min(tile_n, n), min(tile_m, m)
    ok = n % tn == 0 and m % tm == 0
    if use_pallas is None:
        use_pallas = ok
    if not (use_pallas and ok):
        d, _ = _nearest_jnp(a, b, None)
        return d
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)[:, None, :]
    a_scaled = a * -2.0
    dmin2 = pl.pallas_call(
        _nn_min_kernel,
        grid=(bsz, n // tn, m // tm),
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda bi, ni, mi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda bi, ni, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni, mi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm), lambda bi, ni, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tn), lambda bi, ni, mi: (bi, 0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(a_scaled, b, a2, b2)
    return jnp.sqrt(jnp.maximum(dmin2[:, 0, :], 1e-12))


# ---------------------------------------------------------------------------
# Pallas kernel: backward b-side accumulation
# ---------------------------------------------------------------------------


def _nn_bwd_kernel(idx_ref, da_ref, out_ref):
    """db[j] = -sum_{i: idx_i == j} da_i as a masked MXU matmul.

    A scatter-add over B*N indices serialises terribly on TPU (measured
    ~60 ms at B=256, N=M=2048); this reformulation builds the per-tile
    one-hot membership mask and contracts it against da on the MXU.
    Grid (B, M/TM, N/TN), accumulating over the N (innermost) axis.
    Blocks: idx (1, TN, 1) int32, da (1, TN, 3), out (1, TM, 3).
    """
    ni = pl.program_id(2)
    mi = pl.program_id(1)
    idx = idx_ref[0]          # (TN, 1)
    da = da_ref[0]            # (TN, 3)
    tn = idx.shape[0]
    tm = out_ref.shape[1]
    j = mi * tm + jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    mask = (idx == j).astype(jnp.float32)  # (TN, TM)
    contrib = jax.lax.dot_general(
        mask, da, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, 3)

    @pl.when(ni == 0)
    def _init():
        out_ref[0] = -contrib

    @pl.when(ni > 0)
    def _accum():
        out_ref[0] = out_ref[0] - contrib


def _gather_rows_kernel(idx_ref, b_ref, out_ref):
    """out[i] = b[idx_i] as a one-hot matmul (the XLA batched gather costs
    ~2x this kernel on TPU). Grid (B, N/TN, M/TM), accumulating over M:
    exactly one membership hit per row, so the sum is the selected row.
    Blocks: idx (1, TN, 1) int32, b (1, TM, 3), out (1, TN, 3)."""
    mi = pl.program_id(2)
    idx = idx_ref[0]          # (TN, 1)
    b = b_ref[0]              # (TM, 3)
    tn = idx.shape[0]
    tm = b.shape[0]
    j = mi * tm + jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    mask = (idx == j).astype(jnp.float32)  # (TN, TM)
    contrib = jax.lax.dot_general(
        mask, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, 3)

    @pl.when(mi == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(mi > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


def _gather_rows(idx: Array, b: Array, tn: int, tm: int,
                 interpret: bool) -> Array:
    """Batched row gather b[batch, idx[batch, i]] -> (B, N, 3)."""
    bsz, n = idx.shape
    m = b.shape[1]
    return pl.pallas_call(
        _gather_rows_kernel,
        grid=(bsz, n // tn, m // tm),
        in_specs=[
            pl.BlockSpec((1, tn, 1), lambda bi, ni, mi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda bi, ni, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, 3), lambda bi, ni, mi: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 3), jnp.float32),
        interpret=interpret,
    )(idx[..., None], b)


def _scatter_db(idx: Array, da: Array, m: int, tn: int, tm: int,
                interpret: bool) -> Array:
    """Accumulate -da into db at positions idx. idx, da: (B, N[, .])."""
    bsz, n = idx.shape
    return pl.pallas_call(
        _nn_bwd_kernel,
        grid=(bsz, m // tm, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, 1), lambda bi, mi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 3), lambda bi, mi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, 3), lambda bi, mi, ni: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, 3), jnp.float32),
        interpret=interpret,
    )(idx[..., None], da)


# ---------------------------------------------------------------------------
# Differentiable nearest-neighbour distances (custom VJP around the kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _nearest_tpu(a: Array, b: Array, b_mask: Optional[Array],
                 tn: int, tm: int, interpret: bool):
    return _nearest_pallas_fwd(a, b, tn, tm, interpret, b_mask)


def _nearest_tpu_fwd(a, b, b_mask, tn, tm, interpret):
    dist, idx = _nearest_pallas_fwd(a, b, tn, tm, interpret, b_mask)
    return (dist, idx), (a, b, dist, idx)


def _nearest_tpu_bwd(tn, tm, interpret, res, cotangents):
    a, b, dist, idx = res
    g, _ = cotangents  # cotangent on idx is meaningless (integer output)
    # d dist_i / d a_i = (a_i - b_{idx_i}) / dist_i
    b_near = _gather_rows(idx, b, tn, tm, interpret)  # (B, N, 3)
    safe = jnp.where(dist > 1e-6, g / jnp.maximum(dist, 1e-6), 0.0)
    da = safe[..., None] * (a - b_near)
    # b_j accumulates -sum_{i: idx_i = j} da_i (mask-matmul kernel; the
    # equivalent scatter-add serialises on TPU). Masked b points are never
    # selected, so they correctly receive zero gradient; the mask itself
    # gets no cotangent.
    db = _scatter_db(idx, da, b.shape[1], tn, tm, interpret)
    return da, db, None


_nearest_tpu.defvjp(_nearest_tpu_fwd, _nearest_tpu_bwd)


def nearest_distances(
    a: Array,
    b: Array,
    *,
    b_mask: Optional[Array] = None,
    tile_n: int = 256,
    tile_m: int = 2048,
    use_pallas: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Per-point Euclidean distance from each point of ``a`` to its nearest
    neighbour in ``b``, plus the neighbour index. Differentiable w.r.t. both
    clouds (through the argmin selection, like the reference's cdist+min).

    Args:
      a: (B, N, 3) query cloud.
      b: (B, M, 3) target cloud.
      b_mask: optional (B, M) validity mask for b — masked points can never
        be the nearest neighbour (folded into the kernel's column norms as
        a +BIG penalty).
      use_pallas: force/disable the Pallas kernel. Default: on for clean
        f32 inputs whose sizes tile evenly; interpret mode on CPU.
    Returns:
      (dist (B, N) float32, idx (B, N) int32)
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    n, m = a.shape[1], b.shape[1]
    tn, tm = min(tile_n, n), min(tile_m, m)
    ok = n % tn == 0 and m % tm == 0
    if use_pallas is None:
        use_pallas = ok
    if not (use_pallas and ok):
        return _nearest_jnp(a, b, b_mask)
    interpret = jax.default_backend() != "tpu"
    return _nearest_tpu(a, b, b_mask, tn, tm, interpret)


# ---------------------------------------------------------------------------
# Chamfer distances (reference API surface: utils/losses.py:13-59)
# ---------------------------------------------------------------------------


def chamfer_distance_l2(
    a: Array,
    b: Array,
    *,
    a_mask: Optional[Array] = None,
    b_mask: Optional[Array] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Directed average nearest-neighbour L2 distances, both directions.

    Mirrors reference utils/losses.py:13-39: returns (dist_a2b, dist_b2a),
    each of shape (B,) — the per-cloud mean over (valid) points.
    """
    d_ab, _ = nearest_distances(a, b, b_mask=b_mask, use_pallas=use_pallas)
    d_ba, _ = nearest_distances(b, a, b_mask=a_mask, use_pallas=use_pallas)
    if a_mask is not None:
        d_ab = jnp.sum(d_ab * a_mask, axis=1) / jnp.maximum(jnp.sum(a_mask, axis=1), 1.0)
    else:
        d_ab = jnp.mean(d_ab, axis=1)
    if b_mask is not None:
        d_ba = jnp.sum(d_ba * b_mask, axis=1) / jnp.maximum(jnp.sum(b_mask, axis=1), 1.0)
    else:
        d_ba = jnp.mean(d_ba, axis=1)
    return d_ab, d_ba


def chamfer_distance(
    a: Array,
    b: Array,
    *,
    bidirectional: bool = True,
    a_mask: Optional[Array] = None,
    b_mask: Optional[Array] = None,
    use_pallas: Optional[bool] = None,
) -> Array:
    """Per-cloud Chamfer distance (B,). Reference utils/losses.py:42-59."""
    d_ab, d_ba = chamfer_distance_l2(
        a, b, a_mask=a_mask, b_mask=b_mask, use_pallas=use_pallas
    )
    if bidirectional:
        return (d_ab + d_ba) / 2.0
    return d_ab
