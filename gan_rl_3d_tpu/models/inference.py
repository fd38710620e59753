"""Optimized inference engine for the completion path.

``prepare_inference_engine`` ahead-of-time folds every eval-mode
normalisation into plain affine layers — BatchNorm into the preceding dense
(all MLPs), the spectral-norm sigma into the discriminator weights — and
casts to a compute dtype (bfloat16 doubles MXU throughput). The result is a
deployment artifact: a pytree of (w, b) stacks driven by ``complete_fast``,
with the encoder running through the fused Pallas kernel
(ops.encoder_kernel) so per-point activations never leave VMEM.

Numerics: f32 engine matches models.rl_gan_net.complete to ~1e-4 (affine
reassociation); bf16 to ~1e-2 — both inside the 1e-3 Chamfer parity budget
for the *distance metric* since the decoder output scale is ~1e-1.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.ops import encoder_kernel

Array = jax.Array

_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


def _fold_bn_mlp(params: list, state: list) -> list:
    """Fold a common.bn_mlp stack into [(w, b), ...] plain affine layers.
    Activations are structural (relu on every layer but the last, a
    caller-chosen final activation) so the engine pytree holds arrays only
    and can be a jit argument."""
    out = []
    for p, s in zip(params, state):
        if "bn" in p:
            w, b = encoder_kernel.fold_bn(p["dense"], p["bn"], s["bn"])
            out.append((w, b))
        else:
            out.append((p["dense"]["w"], p["dense"]["b"]))
    return out


def _fold_discriminator(params: dict, state: dict) -> list:
    """Fold spectral norm (eval mode: sigma from stored u/v); LayerNorm
    stays a runtime op. Entries: (w, b, ln_params_or_None)."""
    out = []
    for p, s in zip(params["layers"], state["layers"]):
        w = p["dense"]["w"]
        if "sn" in s:
            sigma = jnp.dot(s["sn"]["v"], w @ s["sn"]["u"])
            w = w / sigma
        out.append((w, p["dense"]["b"], p.get("ln")))
    return out


def _apply_mlp(layers: list, x: Array, dtype,
               final_act: str = "none") -> Array:
    n = len(layers)
    for i, (w, b) in enumerate(layers):
        x = jnp.dot(x.astype(dtype), w.astype(dtype),
                    preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        x = _ACTS["relu" if i < n - 1 else final_act](x)
    return x


def _apply_discriminator(layers: list, x: Array, dtype,
                         leak: float = 0.2) -> Array:
    for w, b, ln in layers:
        x = jnp.dot(x.astype(dtype), w.astype(dtype),
                    preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if ln is not None:
            x = nn.layernorm_apply(ln, x)
            x = jnp.where(x >= 0, x, leak * x)
    return x


def prepare_inference_engine(model: dict, *, dtype=jnp.float32,
                             quantize_int8: bool = False) -> dict:
    """Fold the full model into a deployment bundle for complete_fast.

    Supports the primary architecture (pointnet encoder + MLP decoder).
    The attention/adaptive variants carry ops that do not fold into plain
    affine stacks; use models.rl_gan_net.complete for those.

    With ``quantize_int8`` the encoder point-MLP — ~98% of the path's
    FLOPs — is additionally quantized to int8 with per-channel weight and
    dynamic per-row activation scales (ops.quantize). At this model's
    layer widths the f32 folded engine is still faster end-to-end (see
    ops/quantize.py's caveat); int8 is an option for wider trunks and for
    4x weight-memory savings. The tail stays in ``dtype``."""
    ae_p, ae_s = model["ae"]["params"], model["ae"]["state"]
    if "attention" in ae_p["encoder"]:
        raise ValueError(
            "inference engine folding supports the pointnet encoder; the "
            "attention variant's data-dependent pooling cannot fold — use "
            "models.rl_gan_net.complete")
    if "mlp" not in ae_p["decoder"]:
        raise ValueError(
            "inference engine folding supports the MLP decoder; the "
            "adaptive variant's residual refinement cannot fold — use "
            "models.rl_gan_net.complete")
    lg_p, lg_s = model["lgan"]["params"], model["lgan"]["state"]
    actor = model["agent"]["actor"]
    def _maybe_cast(x):
        # only 2-D kernels go to the compute dtype; biases/LN params stay
        # f32; activation-name strings pass through untouched
        if isinstance(x, jax.Array) and x.ndim == 2:
            return x.astype(dtype)
        return x

    cast = lambda tree: jax.tree.map(_maybe_cast, tree)
    engine = {
        "encoder": encoder_kernel.fold_encoder_params(
            ae_p["encoder"], ae_s["encoder"], dtype=dtype),
        "decoder": _fold_bn_mlp(ae_p["decoder"]["mlp"],
                                ae_s["decoder"]["mlp"]),
        "generator": _fold_bn_mlp(lg_p["generator"]["mlp"],
                                  lg_s["generator"]["mlp"]),
        "actor": _fold_bn_mlp(actor["params"]["mlp"],
                              actor["state"]["mlp"]),
        "discriminator": _fold_discriminator(lg_p["discriminator"],
                                             lg_s["discriminator"]),
    }
    snap = model.get("gan_path")
    if snap is not None:
        # serving GAN branch preserved by joint.preserve_gan_path: fold its
        # own generator/decoder; complete_fast routes the GAN branch
        # through these (the (2B, .) shared-decoder concat no longer
        # applies — the two branches decode through different weights)
        engine["gan_generator"] = _fold_bn_mlp(
            snap["generator"]["params"]["mlp"],
            snap["generator"]["state"]["mlp"])
        engine["gan_decoder"] = _fold_bn_mlp(
            snap["decoder"]["params"]["mlp"],
            snap["decoder"]["state"]["mlp"])
    engine = cast(engine)
    if quantize_int8:
        from gan_rl_3d_tpu.ops import quantize

        folded_f32 = encoder_kernel.fold_encoder_params(
            ae_p["encoder"], ae_s["encoder"], dtype=jnp.float32)
        engine["encoder_q"] = quantize.quantize_encoder(folded_f32["layers"])
    return engine


def save_engine(path: str, engine: dict) -> None:
    """Persist a folded engine as a deployment artifact (single file)."""
    from gan_rl_3d_tpu.utils import checkpoint

    checkpoint.save_checkpoint(path, engine, use_orbax=False)


def load_engine(path: str) -> dict:
    from gan_rl_3d_tpu.utils import checkpoint

    return checkpoint.load_checkpoint(path, use_orbax=False)


def complete_fast(
    engine: dict,
    pc: Array,
    mask: Optional[Array] = None,
    *,
    dtype=jnp.float32,
    hybrid: bool = True,
    use_kernel: Optional[bool] = None,
    gate_mode: str = "discriminator",
    gate_bias: float = 0.0,
) -> Dict[str, Array]:
    """Optimized completion: folded encoder -> folded actor/G/decoder
    (+ hybrid gate). Same outputs as models.rl_gan_net.complete with
    add_noise=False, including its ``gate_mode`` policy ("discriminator" =
    reference D-score gate, with the calibratable ``gate_bias`` decision
    threshold; "rl"/"ae" trust one path and skip the discriminator
    entirely).

    Encoder routing (measured on the target chip, benchmarks/engine_probe):
    f32 goes through the XLA schedule of the folded chain (fastest — XLA
    overlaps MXU/VPU across layers better than the monolithic kernel tile);
    bf16 goes through the Pallas VMEM-resident kernel; an int8 bundle
    (``encoder_q``) uses the quantized kernel. Override with
    ``use_kernel``.

    ``gate_mode="union"`` mirrors rl_gan_net.complete: per-point fusion,
    (B, 2N, 3) output at double the point budget."""
    if gate_mode not in ("discriminator", "rl", "ae", "union"):
        raise ValueError(f"invalid gate_mode {gate_mode!r}")
    bsz = pc.shape[0]
    if "encoder_q" in engine:
        pooled = encoder_kernel.fused_encoder_pool_int8(
            pc, engine["encoder_q"], mask)
        hw, hb = engine["encoder"]["head"]
        noisy_gfv = jax.nn.relu(pooled @ hw.astype(jnp.float32)
                                + hb.astype(jnp.float32))
    else:
        if use_kernel is None:
            use_kernel = dtype == jnp.bfloat16
        noisy_gfv = encoder_kernel.encode_fused(pc, engine["encoder"], mask,
                                                compute_dtype=dtype,
                                                use_kernel=use_kernel)
    z = _apply_mlp(engine["actor"], noisy_gfv, dtype, "tanh")
    if "gan_decoder" in engine:
        # preserved serving GAN branch (joint.preserve_gan_path): its own
        # folded generator + decoder; the shared-decoder (2B, .) concat
        # below doesn't apply since the branches decode through different
        # weights — two (B, .) passes instead
        clean_gfv = _apply_mlp(engine["gan_generator"], z, dtype, "tanh")
        completed = _apply_mlp(engine["gan_decoder"], clean_gfv,
                               dtype).reshape(bsz, -1, 3)
        ae_recon = _apply_mlp(engine["decoder"], noisy_gfv,
                              dtype).reshape(bsz, -1, 3)
        both_gfv = jnp.concatenate([clean_gfv, noisy_gfv], axis=0)
    else:
        clean_gfv = _apply_mlp(engine["generator"], z, dtype, "tanh")
        # one concat pass through the decoder (and discriminator, below)
        # for the GAN path and the plain AE path: a (2B, .) matmul keeps
        # the MXU busier than two back-to-back (B, .) dispatches and
        # halves weight re-reads
        both_gfv = jnp.concatenate([clean_gfv, noisy_gfv], axis=0)
        both_pc = _apply_mlp(engine["decoder"], both_gfv, dtype)
        both_pc = both_pc.reshape(2 * bsz, -1, 3)
        completed, ae_recon = both_pc[:bsz], both_pc[bsz:]
    results = {
        "noisy_gfv": noisy_gfv,
        "z_vector": z,
        "clean_gfv": clean_gfv,
        "completed_pc": completed,
        "ae_reconstruction": ae_recon,
    }
    if hybrid:
        if gate_mode == "rl":
            results["hybrid_output"] = completed
        elif gate_mode == "ae":
            results["hybrid_output"] = ae_recon
        elif gate_mode == "union":
            results["hybrid_output"] = jnp.concatenate(
                [completed, ae_recon], axis=1)
        else:  # "discriminator"
            both_scores = _apply_discriminator(engine["discriminator"],
                                               both_gfv, dtype)
            rl_score, ae_score = both_scores[:bsz], both_scores[bsz:]
            better = (rl_score > ae_score + gate_bias).astype(
                completed.dtype)[..., None]
            results["hybrid_output"] = (better * completed
                                        + (1.0 - better) * ae_recon)
            results["rl_gan_score"] = rl_score
            results["ae_score"] = ae_score
    return results
