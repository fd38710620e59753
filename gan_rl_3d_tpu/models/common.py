"""Shared building block: Dense(+BatchNorm)(+activation) stacks.

The whole reference model family is stacks of Linear/Conv1d(1x1) + norm +
activation (autoencoder.py, latent_gan.py, rl_agent.py in /root/reference);
this module is the single implementation they all compose.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax

from gan_rl_3d_tpu import nn

Array = jax.Array


def bn_mlp_init(
    key,
    in_dim: int,
    hidden_dims: Sequence[int],
    *,
    w_init: Callable = nn.kaiming_uniform,
    bias_const: Optional[float] = None,
    final_plain: bool = False,
) -> Tuple[list, list]:
    """Stack of [Dense -> BatchNorm] blocks. When ``final_plain`` the last
    Dense has no BatchNorm (params entry {'dense': ..} only)."""
    params, state = [], []
    dims = list(hidden_dims)
    keys = jax.random.split(key, len(dims))
    d_in = in_dim
    for i, (k, d_out) in enumerate(zip(keys, dims)):
        layer_p = {"dense": nn.dense_init(k, d_in, d_out, w_init=w_init,
                                          bias_const=bias_const)}
        layer_s = {}
        if not (final_plain and i == len(dims) - 1):
            bn_p, bn_s = nn.batchnorm_init(d_out)
            layer_p["bn"] = bn_p
            layer_s["bn"] = bn_s
        params.append(layer_p)
        state.append(layer_s)
        d_in = d_out
    return params, state


def bn_mlp_apply(
    params: list,
    state: list,
    x: Array,
    *,
    training: bool,
    activation: Callable = jax.nn.relu,
    final_activation: Optional[Callable] = None,
) -> Tuple[Array, list]:
    """Apply the stack. Blocks with a 'bn' entry run Dense->BN->activation;
    a plain block (no 'bn': the final_plain block) runs Dense then
    ``final_activation`` if given."""
    new_state = []
    for p, s in zip(params, state):
        x = nn.dense_apply(p["dense"], x)
        if "bn" in p:
            x, bn_s = nn.batchnorm_apply(p["bn"], s["bn"], x, training=training)
            new_state.append({"bn": bn_s})
            x = activation(x)
        else:
            new_state.append({})
            if final_activation is not None:
                x = final_activation(x)
    return x, new_state
