"""Functional neural-network core.

Every layer is a pair of pure functions:

* ``*_init(key, ...) -> params`` (and for stateful layers ``-> (params, state)``)
* ``*_apply(params, x, ...) -> y`` (stateful layers return ``(y, new_state)``)

Parameters and state are plain dict pytrees, so they jit/vmap/shard/checkpoint
without any framework machinery. Mutable-state layers (BatchNorm running
statistics, spectral-norm power-iteration vectors) thread their state
explicitly — the JAX-native replacement for torch's module buffers.

Semantics deliberately match torch so that weights converted from the
reference checkpoints reproduce outputs to ~1e-5 (see
tests/test_torch_parity.py):

* BatchNorm: eps 1e-5, momentum 0.1, biased variance for normalisation and
  unbiased variance for the running estimate (torch.nn.BatchNorm1d).
* LayerNorm: eps 1e-5, elementwise affine (torch.nn.LayerNorm).
* Spectral norm: one power iteration per training forward on u/v buffers
  excluded from differentiation; sigma stays differentiable w.r.t. the
  weight (torch.nn.utils.spectral_norm).
"""

from __future__ import annotations

import contextlib
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PRNGKey = jax.Array

# ---------------------------------------------------------------------------
# Initializers (match the torch defaults the reference relies on)
# ---------------------------------------------------------------------------


def kaiming_uniform(key: PRNGKey, shape: Tuple[int, int], dtype=jnp.float32) -> Array:
    """torch.nn.Linear / Conv1d default weight init: kaiming_uniform(a=sqrt(5)).

    ``shape`` is (fan_in, fan_out); the bound reduces to 1/sqrt(fan_in).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key: PRNGKey, shape: Tuple[int, int], dtype=jnp.float32) -> Array:
    """torch.nn.init.xavier_uniform_ for a (fan_in, fan_out) weight."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_uniform(key: PRNGKey, fan_in: int, out_dim: int, dtype=jnp.float32) -> Array:
    """torch.nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_dim,), dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# Dense (torch Linear / 1x1 Conv1d — identical math on a channels-last layout)
# ---------------------------------------------------------------------------


def dense_init(
    key: PRNGKey,
    in_dim: int,
    out_dim: int,
    *,
    w_init: Callable = kaiming_uniform,
    bias_const: float | None = None,
    dtype=jnp.float32,
) -> dict:
    """Weights are stored (in_dim, out_dim) — the natural layout for x @ w on
    the MXU. ``bias_const`` overrides the default torch bias init (the
    reference's actor/critic use constant 0.01, rl_agent.py:53-58,103-108).
    """
    kw, kb = jax.random.split(key)
    w = w_init(kw, (in_dim, out_dim), dtype)
    if bias_const is not None:
        b = jnp.full((out_dim,), bias_const, dtype)
    else:
        b = torch_bias_uniform(kb, in_dim, out_dim, dtype)
    return {"w": w, "b": b}


def dense_apply(params: dict, x: Array) -> Array:
    """Matmul in the parameter/activation dtype with f32 MXU accumulation;
    the result follows the WEIGHT's dtype — the precision policy lives in
    the params. Under a uniform bf16 policy (params cast at the call site)
    activations stay bf16; a layer whose params are deliberately kept f32
    (the selective-precision decoder head) promotes its bf16 input and
    emits f32, creating an f32 island without any extra plumbing."""
    y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    return (y + params["b"].astype(jnp.float32)).astype(params["w"].dtype)


# ---------------------------------------------------------------------------
# BatchNorm (torch.nn.BatchNorm1d semantics, channels-last)
# ---------------------------------------------------------------------------


def batchnorm_init(dim: int, dtype=jnp.float32) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


# Training-mode BN statistics policy. "centered" is the guaranteed-safe
# two-pass form (see the comment inside batchnorm_apply). "single_read_grouped"
# computes both moments in ONE read of the activation, with the reduction
# shard-ALIGNED so the sharded-vs-single-device equivalence guarantee
# survives the E[x^2]-mean^2 cancellation that killed the three naive
# single-read variants (docs/PERF.md rejection #7): the reduced axes are
# reshaped into _BN_GROUPS fixed groups that coincide with the data-mesh
# shards, each group is reduced locally (same compiled slab reduction in
# both partitionings), and the (G, C) partials are combined in a fixed
# sequential Neumaier-compensated order both programs execute identically.
#
# The mode is trace-time static. It is threaded through the deep model call
# stacks via this module-level context instead of a kwarg on every apply
# function; the ONLY safe place to set it is inside a jitted function that
# carries the mode as a static argument (train/steps.py does), so the jit
# cache key always reflects it.
_BN_STATS_MODE = "centered"
_BN_STATS_MODES = ("centered", "single_read_grouped")
# Group count for the shard-aligned reduction. Alignment (and therefore the
# equivalence guarantee) holds when the data-mesh batch shards divide the
# groups evenly — i.e. 1/2/4/8 data shards with G=8. A mesh with MORE than
# 8 data shards would split groups across devices and reintroduce
# partition-dependent rounding: use bn_stats="centered" there (config
# documents this), or raise G to the device count.
_BN_GROUPS = 8


def validate_bn_stats_mesh(bn_stats: str, data_shards: int) -> None:
    """Fail loudly when single_read_grouped's alignment precondition is
    violated: every fixed group must lie within one batch shard, i.e. the
    data-mesh axis size must divide _BN_GROUPS. A 16-shard (or 6-shard)
    mesh would otherwise silently break the guaranteed sharded-vs-single-
    device trajectory equivalence (docs/PERF.md #7)."""
    if bn_stats == "single_read_grouped" and _BN_GROUPS % data_shards != 0:
        raise ValueError(
            f"training.bn_stats='single_read_grouped' requires the data "
            f"mesh axis ({data_shards} shards) to divide "
            f"_BN_GROUPS={_BN_GROUPS}; use bn_stats='centered' on larger "
            f"meshes (see docs/PERF.md #7)")


@contextlib.contextmanager
def bn_stats_mode(mode: str):
    """Trace-time BN statistics policy switch (see _BN_STATS_MODE above)."""
    if mode not in _BN_STATS_MODES:
        raise ValueError(f"bn_stats must be one of {_BN_STATS_MODES}, "
                         f"got {mode!r}")
    global _BN_STATS_MODE
    prev = _BN_STATS_MODE
    _BN_STATS_MODE = mode
    try:
        yield
    finally:
        _BN_STATS_MODE = prev


def _neumaier_combine(parts: Array) -> Array:
    """Sum the leading axis of ``parts`` (G, C) in a fixed sequential order
    with Neumaier compensation. G is static and small, so the unrolled
    chain is a handful of VPU ops on tiny arrays; under data-parallel
    sharding XLA gathers the 2 KB of partials and every device runs the
    identical chain. Algebraically this is an exact sum, so autodiff
    gives the correct gradient (1 per partial) without a custom VJP."""
    s = parts[0]
    c = jnp.zeros_like(s)
    for i in range(1, parts.shape[0]):
        p = parts[i]
        t = s + p
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s)
        s = t
    return s + c


def _grouped_moments(x32: Array) -> Tuple[Array, Array]:
    """(mean, biased var) over all but the last axis, one read, shard-aligned
    (requires leading dim divisible by _BN_GROUPS — caller checks)."""
    ch = x32.shape[-1]
    n = x32.size // ch
    xg = x32.reshape(_BN_GROUPS, n // _BN_GROUPS, ch)
    # XLA multi-output-fuses the two reductions into one pass over xg
    s_g = jnp.sum(xg, axis=1)
    q_g = jnp.sum(xg * xg, axis=1)
    total = _neumaier_combine(s_g)
    total_sq = _neumaier_combine(q_g)
    mean = total / n
    var = jnp.maximum(total_sq / n - mean * mean, 0.0)
    return mean, var


def batchnorm_apply(
    params: dict,
    state: dict,
    x: Array,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[Array, dict]:
    """Normalise over every axis except the last (channel) axis.

    For (B, C) inputs this matches torch BatchNorm1d over B; for our
    channels-last point features (B, N, C) it matches torch's (B, C, N)
    normalisation over (B, N).

    Statistics and normalisation are always computed in float32 (running
    stats stay f32 under a bf16 activation policy); the output follows the
    input dtype.
    """
    x32 = x.astype(jnp.float32)
    if training:
        axes = tuple(range(x.ndim - 1))
        if (_BN_STATS_MODE == "single_read_grouped"
                and x.shape[0] % _BN_GROUPS == 0):
            # One fused read for both moments, shard-aligned grouping +
            # compensated fixed-order combine — see _grouped_moments.
            mean, var = _grouped_moments(x32)
        else:
            # Centered two-pass moments, the guaranteed-safe default.
            # Every NAIVE single-read variant tried saves one full HBM
            # read over the (B, N, C) activation per BN layer (worth -9%
            # on the whole AE train step) and every one breaks the
            # sharded-vs-single-device trajectory equivalence this
            # framework guarantees (tests/test_sharding.py):
            #   * E[x^2]-E[x]^2 (round 2): 3-step loss divergence
            #     1e-8 -> 3e-3
            #   * shift by the RUNNING mean (round 3): degenerates to the
            #     above at init, where that state is 0 — measured 2.5e-3
            #   * shift by a partition-invariant batch-prefix sample mean
            #     (round 3): the between-cloud mean variance leaves the
            #     shift ~a std off, and the 3-step Adam trajectory
            #     amplifies the var rounding to 5e-3
            # See docs/PERF.md rejection #7 for the numbers. The centered
            # form keeps the var-pass partials small and positive so every
            # partitioning rounds alike; "single_read_grouped" instead
            # makes the partitionings round IDENTICALLY by construction.
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32 - mean), axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        }
        inv = jax.lax.rsqrt(var + eps)
        scale32 = params["scale"].astype(jnp.float32)
        bias32 = params["bias"].astype(jnp.float32)
        y = (x32 - mean) * (inv * scale32) + bias32
        return y.astype(x.dtype), new_state
    mean, var = state["mean"], state["var"]
    inv = jax.lax.rsqrt(var + eps)
    scale32 = params["scale"].astype(jnp.float32)
    bias32 = params["bias"].astype(jnp.float32)
    y = (x32 - mean) * (inv * scale32) + bias32
    return y.astype(x.dtype), state


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def layernorm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params: dict, x: Array, *, eps: float = 1e-5) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout(key: PRNGKey, x: Array, rate: float, *, training: bool) -> Array:
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Spectral normalisation (explicit power-iteration state)
# ---------------------------------------------------------------------------


def spectral_norm_init(key: PRNGKey, w_shape: Tuple[int, int], dtype=jnp.float32) -> dict:
    """State holds the left/right singular-vector estimates.

    torch's spectral_norm works on the (out, in) weight with u in R^out;
    our weights are (in, out), so u estimates the *output*-side vector
    (length out_dim) and v the input side — the same vectors, same sigma.
    """
    in_dim, out_dim = w_shape
    ku, kv = jax.random.split(key)
    u = jax.random.normal(ku, (out_dim,), dtype)
    v = jax.random.normal(kv, (in_dim,), dtype)
    u = u / (jnp.linalg.norm(u) + 1e-12)
    v = v / (jnp.linalg.norm(v) + 1e-12)
    return {"u": u, "v": v}


def spectral_norm_apply(
    w: Array,
    state: dict,
    *,
    training: bool,
    n_iter: int = 1,
    eps: float = 1e-12,
) -> Tuple[Array, dict]:
    """Return w / sigma(w) and the updated power-iteration state.

    u/v are treated as constants for differentiation (stop_gradient), while
    sigma = u^T w v stays a function of w — matching torch, where u/v are
    buffers but the weight is live inside sigma, so WGAN-GP's double
    backward flows through w / (u^T w v).
    """
    u = jax.lax.stop_gradient(state["u"])  # (out,)
    v = jax.lax.stop_gradient(state["v"])  # (in,)
    if training:
        w_c = jax.lax.stop_gradient(w)
        for _ in range(n_iter):
            # torch order (W=(out,in)): v = normalize(W^T u); u = normalize(W v)
            v = w_c @ u  # (in,out) @ (out,) -> (in,)
            v = v / (jnp.linalg.norm(v) + eps)
            u = v @ w_c  # (in,) @ (in,out) -> (out,)
            u = u / (jnp.linalg.norm(u) + eps)
        new_state = {"u": u, "v": v}
    else:
        new_state = state
    sigma = jnp.dot(v, w @ u)  # = u^T W v in torch's layout
    return w / sigma, new_state
