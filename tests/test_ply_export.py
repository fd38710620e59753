"""PLY export round trip + results viewer generation."""

import numpy as np

from gan_rl_3d_tpu.data.dataset import load_ply
from gan_rl_3d_tpu.utils import ply


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(128, 3).astype(np.float32)
    path = tmp_path / "x.ply"
    ply.save_ply(str(path), pts, ply.COLOR_GROUND_TRUTH)
    loaded = load_ply(path)
    np.testing.assert_allclose(loaded, pts, atol=1e-5)
    header = path.read_text().splitlines()[:10]
    assert header[0] == "ply"
    assert "element vertex 128" in header[2]


def test_save_completion_sample_and_html(tmp_path):
    rng = np.random.RandomState(1)
    inc = rng.randn(100, 3).astype(np.float32)
    gt = rng.randn(128, 3).astype(np.float32)
    rec = rng.randn(128, 3).astype(np.float32)
    mask = np.concatenate([np.ones(80), np.zeros(20)])
    ply.save_completion_sample(str(tmp_path), 1, "lamp", inc, gt, rec,
                               incomplete_mask=mask)
    files = sorted(p.name for p in tmp_path.glob("*.ply"))
    assert files == ["sample_01_lamp_ground_truth.ply",
                     "sample_01_lamp_incomplete.ply",
                     "sample_01_lamp_reconstructed.ply"]
    # masked incomplete keeps only the valid 80 points
    assert len(load_ply(tmp_path / "sample_01_lamp_incomplete.ply")) == 80

    ply.write_results_html(str(tmp_path / "viewer.html"),
                           {"chamfer_distance": 0.0123}, ["sample_01_lamp"])
    html = (tmp_path / "viewer.html").read_text()
    assert "chamfer_distance" in html and "0.0123" in html
