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


# ---------------------------------------------------------------------------
# Export: this framework's pytrees -> reference-loadable .pth
# (inverse of the converters above; key layout per the reference Sequentials:
# autoencoder.py:29-54/95-108, latent_gan.py:29-47/168-193, rl_agent.py:30-48,
# 85-101; file format per rl_gan_net.py:237-251 + rl_agent.py:369-381)
# ---------------------------------------------------------------------------


def _torch_tensor(x):
    import torch

    # copy: jax CPU arrays expose read-only numpy views
    return torch.from_numpy(np.array(x, copy=True))


def _emit_dense(sd: Dict, key: str, p: dict, *, conv: bool = False,
                weight_name: str = "weight") -> None:
    w = np.asarray(p["w"]).T  # ours (in, out) -> torch (out, in)
    if conv:
        w = w[:, :, None]  # Conv1d 1x1: (out, in, 1)
    sd[f"{key}.{weight_name}"] = _torch_tensor(w)
    sd[f"{key}.bias"] = _torch_tensor(p["b"])


def _emit_bn(sd: Dict, key: str, bn_p: dict, bn_s: dict) -> None:
    import torch

    sd[f"{key}.weight"] = _torch_tensor(bn_p["scale"])
    sd[f"{key}.bias"] = _torch_tensor(bn_p["bias"])
    sd[f"{key}.running_mean"] = _torch_tensor(bn_s["mean"])
    sd[f"{key}.running_var"] = _torch_tensor(bn_s["var"])
    # unused by BN forward when momentum is set (the reference default);
    # present because load_state_dict is strict about buffer keys
    sd[f"{key}.num_batches_tracked"] = torch.zeros((), dtype=torch.int64)


def export_bn_mlp(params: list, state: list, prefix: str, *,
                  conv: bool = False) -> Dict:
    """Inverse of convert_bn_mlp: emit torch Sequential keys. Layers with a
    BN occupy 3 slots (Dense, BN, act); BN-less layers occupy 1 — matching
    every reference Sequential, where only trailing layers drop the BN."""
    sd: Dict = {}
    pos = 0
    for p, s in zip(params, state):
        _emit_dense(sd, f"{prefix}.{pos}", p["dense"], conv=conv)
        if "bn" in p:
            _emit_bn(sd, f"{prefix}.{pos + 1}", p["bn"], s["bn"])
            pos += 3
        else:
            pos += 1
    return sd


def export_autoencoder(ae: Dict) -> Dict:
    """models.autoencoder pytree -> PointCloudAutoencoder.state_dict()."""
    p, s = ae["params"], ae["state"]
    sd = export_bn_mlp(p["encoder"]["point_mlp"], s["encoder"]["point_mlp"],
                       "encoder.point_mlp", conv=True)
    sd.update(export_bn_mlp(p["encoder"]["head"], s["encoder"]["head"],
                            "encoder.global_mlp"))
    sd.update(export_bn_mlp(p["decoder"]["mlp"], s["decoder"]["mlp"],
                            "decoder.mlp"))
    return sd


def export_latent_gan(lgan: Dict) -> Dict:
    """models.latent_gan pytree -> LatentGAN.state_dict(). Handles both the
    spectral-norm discriminator (weight_orig/u/v) and the plain LayerNorm
    variant; non-final layers occupy 4 Sequential slots (Linear, LayerNorm,
    LeakyReLU, Dropout), the final Linear one."""
    p, s = lgan["params"], lgan["state"]
    sd = export_bn_mlp(p["generator"]["mlp"], s["generator"]["mlp"],
                       "generator.generator")
    prefix = "discriminator.discriminator"
    pos = 0
    for lp, ls in zip(p["discriminator"]["layers"],
                      s["discriminator"]["layers"]):
        key = f"{prefix}.{pos}"
        if "sn" in ls:
            _emit_dense(sd, key, lp["dense"], weight_name="weight_orig")
            sd[f"{key}.weight_u"] = _torch_tensor(ls["sn"]["u"])
            sd[f"{key}.weight_v"] = _torch_tensor(ls["sn"]["v"])
        else:
            _emit_dense(sd, key, lp["dense"])
        if "ln" in lp:
            sd[f"{prefix}.{pos + 1}.weight"] = _torch_tensor(
                lp["ln"]["scale"])
            sd[f"{prefix}.{pos + 1}.bias"] = _torch_tensor(lp["ln"]["bias"])
            pos += 4
        else:
            pos += 1
    return sd


def export_actor(net: Dict) -> Dict:
    return export_bn_mlp(net["params"]["mlp"], net["state"]["mlp"], "actor")


def export_critic(net: Dict) -> Dict:
    p, s = net["params"], net["state"]
    sd: Dict = {}
    for ours, theirs in (("state_fc", "state_fc1"), ("action_fc", "action_fc"),
                         ("comb_fc1", "combined_fc1"),
                         ("comb_fc2", "combined_fc2"),
                         ("out_fc", "output_fc")):
        _emit_dense(sd, theirs, p[ours])
    for ours, theirs in (("bn1", "state_bn1"), ("bn2", "combined_bn1"),
                         ("bn3", "combined_bn2")):
        _emit_bn(sd, theirs, p[ours], s[ours])
    return sd


def _fresh_adam_state(sd: Dict, lr: float) -> Dict:
    """A loadable fresh torch Adam state dict sized to ``sd``'s parameter
    tensors (weights/biases; running stats and num_batches_tracked are
    buffers). Optimizer moments are not migrated in either direction."""
    import torch

    n = sum(1 for k in sd
            if (k.endswith(".weight") or k.endswith(".bias")
                or k.endswith(".weight_orig"))
            and not k.endswith("num_batches_tracked"))
    params = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n)]
    return torch.optim.Adam(params, lr=lr).state_dict()


def export_reference_checkpoint(model: Dict, path: str, *, epoch: int = 0,
                                phase: str = "joint", config: Dict = None,
                                actor_lr: float = 1e-4,
                                critic_lr: float = 1e-3) -> str:
    """Write this framework's model bundle as a reference-loadable .pth pair:
    ``path`` with autoencoder+latent-GAN state dicts (rl_gan_net.py:237-251)
    and the ``*_rl_agent.pth`` sibling with the 6 agent networks + fresh
    optimizer states (rl_agent.py:369-381) — RLGANNet.load_checkpoint
    consumes both unconditionally. Returns the sibling path."""
    import torch

    torch.save({
        "epoch": epoch,
        "phase": phase,
        "config": config or {},
        "autoencoder_state_dict": export_autoencoder(model["ae"]),
        "latent_gan_state_dict": export_latent_gan(model["lgan"]),
    }, path)
    agent = model["agent"]
    rl_sd = {name: (export_actor if "actor" in name else export_critic)(
        agent[name]) for name in ("actor", "critic1", "critic2",
                                  "actor_target", "critic1_target",
                                  "critic2_target")}
    rl_sd["actor_optimizer"] = _fresh_adam_state(rl_sd["actor"], actor_lr)
    for c in ("critic1", "critic2"):
        rl_sd[f"{c}_optimizer"] = _fresh_adam_state(rl_sd[c], critic_lr)
    rl_path = str(path).replace(".pth", "_rl_agent.pth")
    torch.save(rl_sd, rl_path)
    return rl_path


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
