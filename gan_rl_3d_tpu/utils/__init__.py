"""Utilities: checkpointing, torch weight conversion, PLY export, logging."""
