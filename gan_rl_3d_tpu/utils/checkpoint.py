"""Checkpoint save/restore.

Logical layout mirrors the reference (SURVEY.md §5 checkpoint row): one
checkpoint holds {epoch, phase, ae, lgan} and the agent (with optimizer
state) rides alongside under 'agent' — but as a single pytree store rather
than two .pth files.

Primary format: Orbax (production path, async-capable, sharding-aware).
A pickle fallback exists for environments without orbax. Reference .pth
checkpoints are importable via utils.torch_convert.load_reference_checkpoint.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str, tree: Dict[str, Any], *,
                    use_orbax: bool = True) -> None:
    """Save a pytree checkpoint. ``path`` becomes a directory (orbax) or a
    single .pkl file (fallback)."""
    p = Path(path)
    if use_orbax and _HAS_ORBAX:
        p.parent.mkdir(parents=True, exist_ok=True)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(p.absolute(), _to_host(tree), force=True)
    else:
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(_to_host(tree), f)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None,
                    *, use_orbax: bool = True) -> Dict[str, Any]:
    """Restore a checkpoint. ``target`` (a matching pytree of arrays) guides
    orbax restoration of custom node types; plain dict/list trees restore
    without it."""
    p = Path(path)
    if use_orbax and _HAS_ORBAX and p.is_dir():
        with ocp.PyTreeCheckpointer() as ckptr:
            if target is not None:
                return ckptr.restore(p.absolute(), item=_to_host(target))
            return ckptr.restore(p.absolute())
    with open(p, "rb") as f:
        return pickle.load(f)


def checkpoint_exists(path: str) -> bool:
    p = Path(path)
    return p.exists()
