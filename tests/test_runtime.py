"""C++ runtime tests: parse/resample/normalize vs numpy reference."""

import numpy as np
import pytest

runtime = pytest.importorskip("gan_rl_3d_tpu.runtime")

try:
    runtime._load()
except ImportError:
    pytest.skip("native runtime not buildable here", allow_module_level=True)


def test_parse_xyz(tmp_path):
    pts = np.random.RandomState(0).randn(500, 5).astype(np.float32)
    f = tmp_path / "cloud.pts"
    np.savetxt(f, pts, fmt="%.6f")
    loaded = runtime.parse_xyz_file(str(f))
    assert loaded.shape == (500, 3)
    np.testing.assert_allclose(loaded, pts[:, :3], atol=1e-5)


def test_parse_xyz_matches_numpy_loadtxt(tmp_path):
    pts = np.random.RandomState(1).randn(200, 3).astype(np.float32)
    f = tmp_path / "cloud.txt"
    np.savetxt(f, pts, fmt="%.8g")
    fast = runtime.parse_xyz_file(str(f))
    slow = np.loadtxt(f).astype(np.float32)[:, :3]
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_parse_ply(tmp_path):
    from gan_rl_3d_tpu.utils import ply
    pts = np.random.RandomState(2).randn(128, 3).astype(np.float32)
    f = tmp_path / "c.ply"
    ply.save_ply(str(f), pts)
    loaded = runtime.parse_ply_file(str(f))
    np.testing.assert_allclose(loaded, pts, atol=1e-5)


def test_normalize_unit_sphere():
    pts = np.random.RandomState(3).randn(300, 3).astype(np.float32) * 5 + 2
    out = runtime.normalize_unit_sphere(pts.copy())
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1).max(), 1.0,
                               rtol=1e-5)


def test_resample_down_and_up():
    pts = np.random.RandomState(4).randn(100, 3).astype(np.float32)
    down = runtime.resample(pts, 40, seed=7)
    assert down.shape == (40, 3)
    rows = {tuple(r) for r in pts}
    assert all(tuple(r) in rows for r in down)
    # without replacement: all distinct
    assert len({tuple(r) for r in down}) == 40
    up = runtime.resample(pts, 150, seed=7)
    assert up.shape == (150, 3)
    np.testing.assert_array_equal(up[:100], pts)
    assert all(tuple(r) in rows for r in up[100:])


def test_load_files_parallel(tmp_path):
    rng = np.random.RandomState(5)
    paths = []
    for i in range(6):
        pts = rng.randn(64, 3).astype(np.float32)
        f = tmp_path / f"c{i}.txt"
        np.savetxt(f, pts, fmt="%.6f")
        paths.append(str(f))
    out = runtime.load_files_parallel(paths, target=32)
    assert out.shape == (6, 32, 3)
    assert np.isfinite(out).all()
