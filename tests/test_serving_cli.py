"""complete_clouds.py serving-path tests: framing round trip, chunked
batch completion, and the --watch service loop (driven in-process with
max_files so it terminates)."""

import argparse
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import complete_clouds as cc
from gan_rl_3d_tpu.config import load_config
from gan_rl_3d_tpu.models import inference
from gan_rl_3d_tpu.models import rl_gan_net as net

N_POINTS = 256
OVERRIDES = {
    "model": {"autoencoder": {"num_points": N_POINTS,
                              "decoder_dims": [128, 128, N_POINTS * 3]}},
}


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    config = load_config(None, overrides=OVERRIDES)
    model = net.init_model(jax.random.PRNGKey(0), config)
    engine = inference.prepare_inference_engine(model)
    eng_path = tmp_path_factory.mktemp("engine") / "engine.pkl"
    inference.save_engine(str(eng_path), engine)
    args = argparse.Namespace(engine=str(eng_path), checkpoint=None,
                              output="hybrid_output", batch_size=2,
                              poll_interval=0.01, settle=0.0, max_files=None,
                              gate_mode=None)
    fn, weights = cc._build_fn(args, config)
    return config, args, fn, weights


def _write_cloud(path, n=300, seed=0):
    pts = np.random.RandomState(seed).randn(n, 3).astype(np.float32)
    np.savetxt(path, pts)
    return pts


def test_load_framed_round_trip(tmp_path):
    src = tmp_path / "c.txt"
    pts = _write_cloud(src, seed=3)
    pc, mask, (centroid, scale) = cc._load_framed(str(src), N_POINTS,
                                                  np.random.RandomState(0))
    assert pc.shape == (N_POINTS, 3) and mask.shape == (N_POINTS,)
    # restoring the frame recovers original coordinate scale
    restored = pc * scale + centroid
    assert np.abs(restored).max() == pytest.approx(np.abs(pts).max(), rel=0.2)
    # normalised cloud lives in the unit sphere
    assert np.linalg.norm(pc[mask > 0], axis=1).max() <= 1.0 + 1e-5


def test_complete_and_write_chunked(served, tmp_path):
    _, args, fn, weights = served
    rng = np.random.RandomState(0)
    items = []
    for i in range(3):  # 3 items, bs=2 -> one full + one padded chunk
        src = tmp_path / f"in_{i}.txt"
        _write_cloud(src, seed=i)
        pc, mask, frame = cc._load_framed(str(src), N_POINTS, rng)
        items.append((src.stem, pc, mask, frame))
    written = cc._complete_and_write(fn, weights, items, 2, tmp_path)
    assert [w.name for w in written] == [f"in_{i}_completed.ply"
                                         for i in range(3)]
    for w in written:
        assert w.exists() and w.stat().st_size > 0


def test_watch_mode_completes_new_files(served, tmp_path):
    config, args, fn, weights = served
    watch_dir = tmp_path / "incoming"
    out_dir = tmp_path / "out"
    watch_dir.mkdir()
    out_dir.mkdir()
    for i in range(2):
        _write_cloud(watch_dir / f"scan_{i}.txt", seed=10 + i)
    (watch_dir / "notes.md").write_text("ignored: wrong suffix")

    wargs = argparse.Namespace(**{**vars(args), "watch": str(watch_dir),
                                  "output_dir": str(out_dir),
                                  "max_files": 2})
    cc._watch(wargs, config, fn, weights, N_POINTS)
    done = sorted(p.name for p in out_dir.iterdir())
    assert done == ["scan_0_completed.ply", "scan_1_completed.ply"]
