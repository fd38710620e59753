"""Fraction-based splitting for flat dataset trees (the knobs the reference
parses but never uses, config.yaml:96-98)."""

import numpy as np

from gan_rl_3d_tpu.data.dataset import ShapeNetDataset


def _make_flat_tree(tmp_path, n=60):
    rng = np.random.RandomState(0)
    for i in range(n):
        np.savetxt(tmp_path / f"model_{i:03d}.txt",
                   rng.randn(32, 3).astype(np.float32), fmt="%.5f")


def test_fraction_split_partitions(tmp_path):
    _make_flat_tree(tmp_path)
    frac = (0.8, 0.1, 0.1)
    parts = {}
    for split in ("train", "val", "test"):
        ds = ShapeNetDataset(str(tmp_path), split, num_points=32,
                             split_fractions=frac, cache_in_memory=False)
        parts[split] = {e["path"] for e in ds.files}
    # disjoint and complete
    assert not (parts["train"] & parts["val"])
    assert not (parts["train"] & parts["test"])
    assert not (parts["val"] & parts["test"])
    total = parts["train"] | parts["val"] | parts["test"]
    assert len(total) == 60
    # roughly the configured proportions
    assert len(parts["train"]) >= 40
    # deterministic across instantiations
    ds2 = ShapeNetDataset(str(tmp_path), "train", num_points=32,
                          split_fractions=frac, cache_in_memory=False)
    assert {e["path"] for e in ds2.files} == parts["train"]
