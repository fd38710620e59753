"""Real-data ingestion: the reference's committed real point clouds
(ASCII PLY with color columns, 1200-2048 points — the format its loader at
reference utils/dataset.py:204-228 targets), realistic format variants,
and a real-format .h5 dataset driven through the full 5-phase pipeline.

These tests close PARITY row 13's asterisk: the multi-format loaders are
exercised on files this project did not generate (when the reference
checkout is present) and on committed-fixture replicas of their quirks
(color columns, comments, variable sizes, h5 layouts)."""

from pathlib import Path

import numpy as np
import pytest

from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.data.dataset import (ShapeNetDataset, load_point_cloud,
                                        resample_with_mask)
from gan_rl_3d_tpu.train import RLGANNetTrainer

REFERENCE_PLY_DIR = Path("/root/reference/results/point_clouds")


# ---------------------------------------------------------------------------
# the reference's real artifacts (skipped when the checkout is absent)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not REFERENCE_PLY_DIR.is_dir(),
                    reason="reference checkout not present")
def test_reference_committed_plys_all_load():
    paths = sorted(REFERENCE_PLY_DIR.glob("*.ply"))
    assert len(paths) == 18
    rng = np.random.RandomState(0)
    for p in paths:
        pc = load_point_cloud(str(p))
        assert pc.ndim == 2 and pc.shape[1] == 3, p.name
        assert 1000 <= len(pc) <= 2500, (p.name, len(pc))
        assert np.all(np.isfinite(pc)), p.name
        resampled, mask = resample_with_mask(pc, 2048, rng)
        assert resampled.shape == (2048, 3)
        assert mask.sum() == min(len(pc), 2048)


@pytest.mark.skipif(not REFERENCE_PLY_DIR.is_dir(),
                    reason="reference checkout not present")
def test_reference_plys_through_dataset(tmp_path):
    """ShapeNetDataset over a tree of the reference's real files (linked,
    not copied), fraction split — the main-path ingestion on real data."""
    tree = tmp_path / "real"
    (tree / "lamp").mkdir(parents=True)
    for p in sorted(REFERENCE_PLY_DIR.glob("*.ply")):
        (tree / "lamp" / p.name).symlink_to(p)
    ds = ShapeNetDataset(str(tree), "train", num_points=2048,
                         split_fractions=(1.0, 0.0, 0.0))
    assert len(ds) == 18
    arr = ds.as_array()
    assert arr.shape == (18, 2048, 3)
    assert np.all(np.isfinite(arr))
    assert ds[0]["category"] == "lamp"


# ---------------------------------------------------------------------------
# committed-fixture replicas of real-format quirks
# ---------------------------------------------------------------------------


def _write_realistic_ply(path, n, seed, *, colors=True, comments=True,
                         extra_props=False, crlf=False):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3
    header = ["ply", "format ascii 1.0"]
    if comments:
        header.append("comment produced by a real scanner pipeline")
    header.append(f"element vertex {n}")
    header += ["property float x", "property float y", "property float z"]
    if colors:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    if extra_props:
        header.append("property float confidence")
    header.append("end_header")
    lines = list(header)
    for p in pts:
        row = f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}"
        if colors:
            row += " 100 255 100"
        if extra_props:
            row += " 0.87"
        lines.append(row)
    eol = "\r\n" if crlf else "\n"
    Path(path).write_text(eol.join(lines) + eol)
    return pts


@pytest.mark.parametrize("kwargs", [
    {"colors": True, "comments": True},
    {"colors": False, "comments": False},
    {"colors": True, "extra_props": True},
    {"colors": True, "crlf": True},
])
def test_ply_header_variants(tmp_path, kwargs):
    path = tmp_path / "v.ply"
    pts = _write_realistic_ply(path, 1234, 1, **kwargs)
    loaded = load_point_cloud(str(path))
    np.testing.assert_allclose(loaded, pts, atol=1e-5)


def _write_h5_cloud(path, n, seed, key="data"):
    import h5py

    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3
    with h5py.File(path, "w") as f:
        f.create_dataset(key, data=pts)
    return pts


def test_h5_key_variants(tmp_path):
    for key in ("data", "points", "cloud_xyz"):
        path = tmp_path / f"{key}.h5"
        pts = _write_h5_cloud(path, 1500, 2, key=key)
        np.testing.assert_allclose(load_point_cloud(str(path)), pts)


N_POINTS = 256


@pytest.fixture(scope="module")
def real_format_tree(tmp_path_factory):
    """A ShapeNet-like tree of VARIABLE-SIZE clouds in mixed real formats
    (.h5 one-cloud-per-file + colored .ply), no split directories — the
    shape of a real download, not this repo's synthetic generator."""
    root = tmp_path_factory.mktemp("realfmt")
    tree = root / "shapenet_real"
    rng = np.random.RandomState(7)
    i = 0
    for cat in ("lamp", "chair"):
        d = tree / cat
        d.mkdir(parents=True)
        for j in range(10):
            n = int(rng.randint(150, 400))  # variable, many below N_POINTS
            if j % 2 == 0:
                _write_h5_cloud(d / f"{cat}_{j:04d}.h5", n, seed=i)
            else:
                _write_realistic_ply(d / f"{cat}_{j:04d}.ply", n, seed=i)
            i += 1
    return root, tree


def test_dataset_over_mixed_real_formats(real_format_tree):
    _, tree = real_format_tree
    ds = ShapeNetDataset(str(tree), "train", num_points=N_POINTS,
                         split_fractions=(0.7, 0.15, 0.15))
    assert len(ds) > 0
    arr = ds.as_array()
    assert arr.shape == (len(ds), N_POINTS, 3)
    assert np.all(np.isfinite(arr))


def test_full_pipeline_on_real_format_h5(real_format_tree):
    """Full 5-phase smoke over the variable-size mixed-format tree — the
    end-to-end run the synthetic path can't substitute for (VERDICT r2
    Missing #1)."""
    root, tree = real_format_tree
    config = load_config(None, overrides={
        "model": {
            "autoencoder": {"num_points": N_POINTS,
                            "decoder_dims": [256, 256, N_POINTS * 3]},
            "rl_agent": {"batch_size": 16, "buffer_size": 500},
        },
        "training": {
            "batch_size": 8,
            "checkpoint_dir": str(root / "ckpt"),
            "log_dir": str(root / "logs"),
            "results_dir": str(root / "results"),
            "autoencoder": {"epochs": 1, "batch_size": 8,
                            "scheduler_step": 1},
            "lgan": {"epochs": 1, "batch_size": 8, "d_steps": 1},
            "rl_agent": {"episodes": 8, "envs_per_step": 8,
                         "start_training_steps": 8},
            "joint": {"enabled": True, "epochs": 1},
        },
        "data": {"data_dir": str(tree),
                 "train_split": 0.7, "val_split": 0.15, "test_split": 0.15},
    })
    trainer = RLGANNetTrainer(config, use_orbax=False)
    trainer.train_full_pipeline()
    assert (root / "ckpt" / "final").exists()
    trainer.close()
