"""Persistent XLA compilation cache.

First-compile of the jitted phase steps costs tens of seconds on TPU; with
the persistent cache enabled, later processes (re-runs, resume, evaluate,
bench) start hot. Called by every CLI entry point; no-op if already set.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/gan_rl_3d_tpu/xla")


def enable_persistent_cache(path: str = _DEFAULT_DIR) -> None:
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimisation, never fatal
        pass
