"""Post-joint discriminator-gate calibration.

The reference's hybrid gate routes each sample to the GAN path when
D(clean_gfv) > D(noisy_gfv) (reference models/rl_gan_net.py:162-171). After
joint fine-tuning shifts the GFV distribution the frozen D's raw comparison
misroutes (headtohead/RESULTS.md); this module makes the gate a measured
artifact instead of a hope:

* ``gate_statistics`` collects per-sample chamfer for both paths plus the
  D-score margin on a validation split;
* ``calibrate_gate`` sweeps the decision threshold (including the two
  degenerate thresholds = trusting one path outright) and returns the
  val-chamfer-minimising (gate_mode, gate_bias);
* the result is persisted as ``gate_calibration.json`` next to the
  checkpoints, and the serving entry points (evaluate.py,
  complete_clouds.py) prefer it over the static config knobs.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
from gan_rl_3d_tpu.ops import pointcloud as pc_ops

GATE_FILE = "gate_calibration.json"


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "bidirectional"))
def gate_stats_step(model: dict, batch: Dict[str, jax.Array], key, *,
                    cfg: rl.TD3Config,
                    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
                    bidirectional: bool = True) -> Dict[str, jax.Array]:
    """Per-sample gate inputs for one batch: chamfer of the GAN path and
    the AE path against ground truth, and the D-score margin
    D(clean) - D(noisy) the gate thresholds on."""
    complete, incomplete, mask = pc_ops.make_training_batch(
        key, batch["complete_pc"], do_augment=False, spec=spec)
    out = net.complete(model, incomplete, mask, cfg=cfg,
                       gate_mode="discriminator")
    cd_rl = chamfer_ops.chamfer_distance(out["completed_pc"], complete,
                                         bidirectional=bidirectional)
    cd_ae = chamfer_ops.chamfer_distance(out["ae_reconstruction"], complete,
                                         bidirectional=bidirectional)
    margin = (out["rl_gan_score"] - out["ae_score"]).reshape(-1)
    return {"cd_rl": cd_rl, "cd_ae": cd_ae, "margin": margin,
            "pad": batch["pad"]}


def gate_statistics(model: dict, batches: Iterable[Dict[str, np.ndarray]],
                    put_fn, key, *, cfg: rl.TD3Config,
                    spec: pc_ops.PreprocSpec = pc_ops.DEFAULT_PREPROC,
                    bidirectional: bool = True
                    ) -> Dict[str, np.ndarray]:
    """Run gate_stats_step over a whole split (fixed hole-cut keys, same
    protocol as trainer validation) and gather host-side arrays with padded
    rows dropped."""
    cols: Dict[str, list] = {"cd_rl": [], "cd_ae": [], "margin": []}
    for i, batch in enumerate(batches):
        m = gate_stats_step(model, put_fn(batch), jax.random.fold_in(key, i),
                            cfg=cfg, spec=spec, bidirectional=bidirectional)
        keep = np.asarray(batch["pad"]) == 0
        for name in cols:
            cols[name].append(np.asarray(m[name])[keep])
    return {name: np.concatenate(vals) for name, vals in cols.items()}


def calibrate_gate(stats: Dict[str, np.ndarray],
                   max_candidates: int = 256) -> Dict[str, object]:
    """Pick the chamfer-minimising gate from collected statistics.

    Sweeps the decision threshold t (route to the GAN path when
    margin > t) over the midpoints of the sorted observed margins — the
    complete set of distinct routings — bounded to ``max_candidates``
    quantile points for very large splits. The two degenerate routings are
    swept implicitly (t below all margins = pure "rl", above all = pure
    "ae") and reported as gate_mode "rl"/"ae" so serving can skip the
    discriminator entirely.
    """
    cd_rl = stats["cd_rl"].astype(np.float64)
    cd_ae = stats["cd_ae"].astype(np.float64)
    margin = stats["margin"].astype(np.float64)
    n = len(margin)
    if n == 0:
        raise ValueError(
            "calibrate_gate: no validation samples (every row padded or "
            "empty loader) — cannot sweep the gate threshold")
    order = np.argsort(margin)
    sorted_margin = margin[order]
    # candidate thresholds: midpoints between consecutive margins, plus
    # one below and one above everything
    mids = (sorted_margin[1:] + sorted_margin[:-1]) / 2.0
    lo = sorted_margin[0] - 1.0
    hi = sorted_margin[-1] + 1.0
    cands = np.concatenate([[lo], mids, [hi]])
    if len(cands) > max_candidates:
        idx = np.linspace(0, len(cands) - 1, max_candidates).astype(int)
        cands = cands[idx]
        cands = np.concatenate([[lo], cands, [hi]])
    means = np.array([
        np.mean(np.where(margin > t, cd_rl, cd_ae)) for t in cands])
    best_i = int(np.argmin(means))
    best_t = float(cands[best_i])
    best_cd = float(means[best_i])
    if best_t <= sorted_margin[0] - 0.5:
        mode, bias = "rl", 0.0
    elif best_t >= sorted_margin[-1] + 0.5:
        mode, bias = "ae", 0.0
    else:
        mode, bias = "discriminator", best_t
    return {
        "gate_mode": mode,
        "gate_bias": bias,
        "val_chamfer_calibrated": best_cd,
        "val_chamfer_raw_gate": float(
            np.mean(np.where(margin > 0.0, cd_rl, cd_ae))),
        "val_chamfer_rl": float(np.mean(cd_rl)),
        "val_chamfer_ae": float(np.mean(cd_ae)),
        "oracle_chamfer": float(np.mean(np.minimum(cd_rl, cd_ae))),
        "n_samples": int(n),
        "rl_route_fraction": float(np.mean(margin > best_t)),
    }


def save_gate_calibration(checkpoint_dir: str,
                          report: Dict[str, object]) -> Path:
    path = Path(checkpoint_dir) / GATE_FILE
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path


def descope_gate_calibration(checkpoint_dir: str, name: str) -> None:
    """Remove ``name`` from an existing sidecar's checkpoint scope.

    Called by the trainer before overwriting a checkpoint without a fresh
    calibration: the stale bias was measured against a different
    discriminator and must not apply to the new weights. Deletes the
    sidecar outright when the scope empties out."""
    path = Path(checkpoint_dir) / GATE_FILE
    if not path.exists():
        return
    try:
        with open(path) as f:
            report = json.load(f)
        applies_to = report.get("checkpoints")
        if applies_to is None or name not in applies_to:
            return
        applies_to = [c for c in applies_to if c != name]
        if applies_to:
            report["checkpoints"] = applies_to
            with open(path, "w") as f:
                json.dump(report, f, indent=2)
        else:
            path.unlink()
        print(f"gate calibration sidecar descoped from {name!r} "
              f"(checkpoint overwritten without re-calibration)")
    except (OSError, ValueError, TypeError):
        return


def load_gate_calibration(checkpoint_dir: str, *,
                          checkpoint: str | None = None,
                          default_mode: str = "discriminator",
                          default_bias: float = 0.0,
                          verbose: bool = False) -> Tuple[str, float]:
    """Serving-side read: the calibrated (gate_mode, gate_bias) when a
    calibration sidecar exists AND applies to ``checkpoint``, otherwise the
    config defaults.

    The calibration is measured against a specific discriminator (the
    phase-5.5 refreshed one), so the sidecar records which checkpoint names
    it belongs to; loading a different checkpoint from the same directory
    (e.g. ``joint_best`` or a pre-joint phase) must NOT inherit it — the
    bias would misroute against the un-refreshed D. ``checkpoint=None``
    (engine serving, where the source checkpoint is unknown) and legacy
    sidecars without the field keep the old always-apply behavior."""
    path = Path(checkpoint_dir) / GATE_FILE
    if not path.exists():
        return default_mode, default_bias
    try:
        with open(path) as f:
            report = json.load(f)
        applies_to = report.get("checkpoints")
        if (applies_to is not None and checkpoint is not None
                and checkpoint not in applies_to):
            if verbose:
                # a silent fallback makes eval numbers change between
                # runs with no trace in the log (advisor r3)
                print(f"gate calibration sidecar present but scoped to "
                      f"{applies_to} — checkpoint {checkpoint!r} uses "
                      f"config defaults (mode={default_mode}, "
                      f"bias={default_bias:.4f})")
            return default_mode, default_bias
        return (str(report.get("gate_mode", default_mode)),
                float(report.get("gate_bias", default_bias)))
    except (OSError, ValueError, TypeError):
        return default_mode, default_bias
