#!/usr/bin/env python
"""Run a repo CLI forced to CPU *in-process* (the JAX_PLATFORMS env var
does not disable the axon TPU plugin — CLAUDE.md), for the z-curve
study scripts. Usage: python cpu_run.py <entry.py> <argv...>"""

import runpy
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

entry = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(entry, run_name="__main__")
