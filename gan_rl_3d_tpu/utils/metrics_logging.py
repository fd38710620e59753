"""Scalar metrics logging: JSONL always, TensorBoard/wandb optionally.

Tag names match the reference's SummaryWriter tags (AE/*, GAN/*, RL/*,
Joint/* — train_rl_gan_net.py:203-205,357-358,422-437,477-478) so existing
dashboards keep working; the JSONL stream is the machine-readable source of
truth (reference had none).

The wandb path honours logging.use_wandb/project_name (reference
configs/config.yaml:119-120 sets use_wandb: true and never imports wandb);
when the package is missing the logger warns once and degrades to
JSONL/TensorBoard instead of silently swallowing the knob.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

log = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, log_dir: str, *, use_tensorboard: bool = False,
                 use_wandb: bool = False, project_name: str = "RL-GAN-Net",
                 filename: str = "metrics.jsonl"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.log_dir / filename, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except ImportError:
                log.warning("logging.use_tensorboard=true but tensorboard "
                            "is not installed; falling back to JSONL only")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project_name,
                                         dir=str(self.log_dir))
            except ImportError:
                log.warning("logging.use_wandb=true but wandb is not "
                            "installed; falling back to JSONL/TensorBoard")

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._file.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        if self._wandb is not None:
            self._wandb.log({tag: float(value)}, step=int(step))

    def log_dict(self, prefix: str, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            self.log_scalar(f"{prefix}/{k}", float(v), step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
