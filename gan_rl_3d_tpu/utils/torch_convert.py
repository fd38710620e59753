"""Convert reference PyTorch checkpoints into this framework's pytrees.

Enables (a) migration of weights trained with the reference implementation
(its .pth layout: rl_gan_net.py:237-251 for ae+lgan, rl_agent.py:369-381 for
the agent) and (b) the golden parity tests in tests/test_torch_parity.py
(same weights -> same outputs within 1e-3, per BASELINE.md).

torch is imported lazily — the TPU runtime itself never needs it.

Layout notes:
* torch Linear weight (out, in) -> ours (in, out): transpose.
* torch Conv1d 1x1 weight (out, in, 1) -> squeeze + transpose.
* spectral-normed Linear: weight_orig/weight_u/weight_v -> dense params +
  {'u', 'v'} power-iteration state.
* All tensors are copied (`.numpy().copy()`): JAX CPU arrays may alias
  numpy views of torch storage that torch later mutates in place.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().copy()


def _dense_from(sd: Dict, key: str, weight_name: str = "weight") -> dict:
    w = _np(sd[f"{key}.{weight_name}"])
    if w.ndim == 3:  # Conv1d 1x1
        w = w[:, :, 0]
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _bn_from(sd: Dict, key: str) -> Tuple[dict, dict]:
    params = {"scale": jnp.asarray(_np(sd[f"{key}.weight"])),
              "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}
    state = {"mean": jnp.asarray(_np(sd[f"{key}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{key}.running_var"]))}
    return params, state


def _seq_indices(sd: Dict, prefix: str) -> List[int]:
    depth = len(prefix.split("."))
    idxs = set()
    for k in sd:
        if k.startswith(prefix + "."):
            idxs.add(int(k.split(".")[depth]))
    return sorted(idxs)


def convert_bn_mlp(sd: Dict, prefix: str) -> Tuple[list, list]:
    """Convert a torch Sequential of [Linear/Conv1d, BatchNorm?, act, ...]
    into a common.bn_mlp (params, state) pair."""
    params: list = []
    state: list = []
    for i in _seq_indices(sd, prefix):
        key = f"{prefix}.{i}"
        if f"{key}.running_mean" in sd:  # BatchNorm for the previous Dense
            bn_p, bn_s = _bn_from(sd, key)
            params[-1]["bn"] = bn_p
            state[-1]["bn"] = bn_s
        elif f"{key}.weight" in sd:  # Linear / Conv1d
            params.append({"dense": _dense_from(sd, key)})
            state.append({})
    return params, state


# ---------------------------------------------------------------------------
# Autoencoder (reference models/autoencoder.py:13-171)
# ---------------------------------------------------------------------------


def convert_autoencoder(sd: Dict) -> Tuple[dict, dict]:
    enc_mlp_p, enc_mlp_s = convert_bn_mlp(sd, "encoder.point_mlp")
    head_p, head_s = convert_bn_mlp(sd, "encoder.global_mlp")
    dec_p, dec_s = convert_bn_mlp(sd, "decoder.mlp")
    params = {"encoder": {"point_mlp": enc_mlp_p, "head": head_p},
              "decoder": {"mlp": dec_p}}
    state = {"encoder": {"point_mlp": enc_mlp_s, "head": head_s},
             "decoder": {"mlp": dec_s}}
    return params, state


# ---------------------------------------------------------------------------
# Latent GAN (reference models/latent_gan.py:14-249)
# ---------------------------------------------------------------------------


def convert_latent_gan(sd: Dict) -> Tuple[dict, dict]:
    gen_p, gen_s = convert_bn_mlp(sd, "generator.generator")
    disc_p: list = []
    disc_s: list = []
    prefix = "discriminator.discriminator"
    for i in _seq_indices(sd, prefix):
        key = f"{prefix}.{i}"
        if f"{key}.weight_orig" in sd:  # spectral-normed Linear
            disc_p.append({"dense": _dense_from(sd, key, "weight_orig")})
            disc_s.append({"sn": {
                "u": jnp.asarray(_np(sd[f"{key}.weight_u"])),
                "v": jnp.asarray(_np(sd[f"{key}.weight_v"])),
            }})
        elif f"{key}.running_mean" in sd:
            raise ValueError("unexpected BatchNorm in discriminator")
        elif f"{key}.weight" in sd:
            w = _np(sd[f"{key}.weight"])
            if w.ndim == 1:  # LayerNorm
                disc_p[-1]["ln"] = {
                    "scale": jnp.asarray(w),
                    "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}
            else:  # plain Linear (non-spectral variant)
                disc_p.append({"dense": _dense_from(sd, key)})
                disc_s.append({})
    params = {"generator": {"mlp": gen_p}, "discriminator": {"layers": disc_p}}
    state = {"generator": {"mlp": gen_s}, "discriminator": {"layers": disc_s}}
    return params, state


# ---------------------------------------------------------------------------
# Alternate architectures (reference models/autoencoder.py:174-323)
# ---------------------------------------------------------------------------


def convert_attention_encoder(sd: Dict, prefix: str = "") -> Tuple[dict, dict]:
    """PointNetWithAttention -> models.variants attention encoder."""
    mlp_p, mlp_s = convert_bn_mlp(sd, f"{prefix}point_mlp")
    head_p, head_s = convert_bn_mlp(sd, f"{prefix}global_mlp")
    att = {"fc1": _dense_from(sd, f"{prefix}attention.0"),
           "fc2": _dense_from(sd, f"{prefix}attention.2")}
    params = {"point_mlp": mlp_p, "attention": att, "head": head_p}
    state = {"point_mlp": mlp_s, "head": head_s}
    return params, state


def convert_adaptive_decoder(sd: Dict, prefix: str = "") -> Tuple[dict, dict]:
    """AdaptivePointDecoder -> models.variants adaptive decoder."""
    feat_p, feat_s = convert_bn_mlp(sd, f"{prefix}feature_mlp")
    gen = _dense_from(sd, f"{prefix}point_mlp.0")
    refine = {"conv1": _dense_from(sd, f"{prefix}refine_mlp.0"),
              "conv2": _dense_from(sd, f"{prefix}refine_mlp.3")}
    bn_p, bn_s = _bn_from(sd, f"{prefix}refine_mlp.1")
    refine["bn"] = bn_p
    params = {"feature_mlp": feat_p, "gen": gen, "refine": refine}
    state = {"feature_mlp": feat_s, "refine_bn": bn_s}
    return params, state


# ---------------------------------------------------------------------------
# TD3 agent (reference models/rl_agent.py:16-133, 369-395)
# ---------------------------------------------------------------------------


def convert_actor(sd: Dict) -> Tuple[dict, dict]:
    p, s = convert_bn_mlp(sd, "actor")
    return {"mlp": p}, {"mlp": s}


def convert_critic(sd: Dict) -> Tuple[dict, dict]:
    params = {
        "state_fc": _dense_from(sd, "state_fc1"),
        "action_fc": _dense_from(sd, "action_fc"),
        "comb_fc1": _dense_from(sd, "combined_fc1"),
        "comb_fc2": _dense_from(sd, "combined_fc2"),
        "out_fc": _dense_from(sd, "output_fc"),
    }
    bn1_p, bn1_s = _bn_from(sd, "state_bn1")
    bn2_p, bn2_s = _bn_from(sd, "combined_bn1")
    bn3_p, bn3_s = _bn_from(sd, "combined_bn2")
    params.update({"bn1": bn1_p, "bn2": bn2_p, "bn3": bn3_p})
    return params, {"bn1": bn1_s, "bn2": bn2_s, "bn3": bn3_s}


def convert_agent_networks(ckpt: Dict) -> Dict[str, dict]:
    """Convert the 6 network state-dicts of an agent checkpoint (optimizer
    moments are not migrated — fresh optax state is the supported path)."""
    out = {}
    for name, conv in (("actor", convert_actor),
                       ("critic1", convert_critic),
                       ("critic2", convert_critic),
                       ("actor_target", convert_actor),
                       ("critic1_target", convert_critic),
                       ("critic2_target", convert_critic)):
        p, s = conv(ckpt[name])
        out[name] = {"params": p, "state": s}
    return out


def load_reference_checkpoint(path: str) -> Dict:
    """Load a reference combined .pth (+ sibling *_rl_agent.pth if present)
    into a model bundle compatible with models.rl_gan_net.init_model."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    ae_p, ae_s = convert_autoencoder(ckpt["autoencoder_state_dict"])
    lg_p, lg_s = convert_latent_gan(ckpt["latent_gan_state_dict"])
    bundle = {
        "ae": {"params": ae_p, "state": ae_s},
        "lgan": {"params": lg_p, "state": lg_s},
        "meta": {"epoch": ckpt.get("epoch"), "phase": ckpt.get("phase")},
    }
    rl_path = path.replace(".pth", "_rl_agent.pth")
    try:
        rl_ckpt = torch.load(rl_path, map_location="cpu", weights_only=False)
        bundle["agent_networks"] = convert_agent_networks(rl_ckpt)
    except FileNotFoundError:
        pass
    return bundle
