"""Data layer tests: synthetic generation, loaders, index caching, batching."""

import json

import numpy as np

from gan_rl_3d_tpu.data import dataset as ds
from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset


def make_tiny_dataset(tmp_path, n=3, num_points=64):
    create_synthetic_dataset(str(tmp_path), samples_per_category=n,
                             num_points=num_points,
                             categories=("airplane", "chair"))
    return tmp_path


def test_synthetic_layout_and_loading(tmp_path):
    root = make_tiny_dataset(tmp_path)
    files = sorted((root / "train" / "airplane").glob("*.txt"))
    assert len(files) == 3
    pc = ds.load_point_cloud(str(files[0]))
    assert pc.shape == (64, 3)
    assert pc.dtype == np.float32


def test_ply_loader_roundtrip(tmp_path):
    pc = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    ply = tmp_path / "test.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pc)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pc:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 255 0 0\n")
    loaded = ds.load_ply(ply)
    np.testing.assert_allclose(loaded, pc, atol=1e-5)


def test_dataset_index_cache_and_resample(tmp_path):
    root = make_tiny_dataset(tmp_path)
    d = ds.ShapeNetDataset(str(root), "train", num_points=128)
    assert len(d) == 6  # 2 categories x 3
    assert (root / "train_data.json").exists()
    item = d[0]
    assert item["complete_pc"].shape == (128, 3)  # upsampled from 64
    assert item["category"] in ("airplane", "chair")
    # cache round trip
    d2 = ds.ShapeNetDataset(str(root), "train", num_points=128)
    assert len(d2) == 6
    with open(root / "train_data.json") as f:
        assert len(json.load(f)) == 6


def test_category_filter(tmp_path):
    root = make_tiny_dataset(tmp_path)
    d = ds.ShapeNetDataset(str(root), "train", num_points=64,
                           categories=["chair"])
    assert len(d) == 3
    assert all(e["category"] == "chair" for e in d.files)


def test_batch_loader_fixed_shapes(tmp_path):
    root = make_tiny_dataset(tmp_path)  # 6 train samples
    d = ds.ShapeNetDataset(str(root), "train", num_points=64)
    loader = ds.BatchLoader(d, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["complete_pc"].shape == (4, 64, 3)
        assert b["pad"].shape == (4,)
    # second batch has 2 wrapped rows
    assert batches[1]["pad"].sum() == 2
    assert batches[0]["pad"].sum() == 0
    # drop_last
    loader2 = ds.BatchLoader(d, batch_size=4, shuffle=False, drop_last=True)
    assert len(list(loader2)) == 1


def test_h5_loader(tmp_path):
    import h5py

    pts = np.random.RandomState(4).randn(100, 3).astype(np.float32)
    with h5py.File(tmp_path / "cloud.h5", "w") as f:
        f.create_dataset("data", data=pts)
    loaded = ds.load_h5(tmp_path / "cloud.h5")
    np.testing.assert_allclose(loaded, pts, atol=1e-6)
    # alternate key name
    with h5py.File(tmp_path / "cloud2.h5", "w") as f:
        f.create_dataset("points", data=pts)
    np.testing.assert_allclose(ds.load_h5(tmp_path / "cloud2.h5"), pts,
                               atol=1e-6)
