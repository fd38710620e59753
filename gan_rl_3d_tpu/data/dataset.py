"""ShapeNet dataset: multi-format loading, index caching, batch iteration.

Capability parity with reference ShapeNetDataset/create_dataloader
(utils/dataset.py:23-461): scans a directory tree for .ply/.pts/.txt/.h5
clouds, caches the file index as ``{split}_data.json``, maps category IDs,
and resamples every cloud to a fixed point count.

TPU-first differences:
* __getitem__ returns the *complete* cloud only — hole-cutting,
  augmentation and normalisation are pure jnp transforms applied on device
  inside the train step (ops.pointcloud.make_training_batch), so batches
  are fixed-shape and the host never blocks on per-sample torch work.
* An optional in-memory cache holds the whole (resampled) dataset as one
  contiguous float32 array — the synthetic dataset is ~50 MB, so epochs
  iterate at memcpy speed instead of re-parsing text files.
* A C++ fast-path loader (gan_rl_3d_tpu.runtime) accelerates text parsing
  when built; numpy is the fallback.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from gan_rl_3d_tpu.data.synthetic import create_synthetic_dataset

CATEGORY_MAPPING = {
    "airplane": "02691156",
    "car": "02958343",
    "chair": "03001627",
    "lamp": "03636649",
    "sofa": "04256520",
    "table": "04379243",
    "watercraft": "04530566",
    "cabinet": "02933112",
}


# ---------------------------------------------------------------------------
# File loaders (reference utils/dataset.py:189-250)
# ---------------------------------------------------------------------------


def load_ply(path: Path) -> np.ndarray:
    """ASCII PLY vertex loader (same format as the reference's committed
    results/point_clouds/*.ply: x y z [r g b])."""
    with open(path) as f:
        lines = f.readlines()
    start = 0
    for i, line in enumerate(lines):
        if line.strip() == "end_header":
            start = i + 1
            break
    pts = []
    for line in lines[start:]:
        parts = line.split()
        if len(parts) >= 3:
            try:
                pts.append([float(parts[0]), float(parts[1]), float(parts[2])])
            except ValueError:
                continue
    return np.asarray(pts, np.float32)


def load_txt(path: Path) -> np.ndarray:
    try:
        from gan_rl_3d_tpu.runtime import parse_xyz_file  # C++ fast path
        return parse_xyz_file(str(path))
    except (ImportError, OSError):
        arr = np.atleast_2d(np.loadtxt(path).astype(np.float32))
        if arr.size == 0:
            return np.zeros((0, 3), np.float32)
        return arr[:, :3]


def load_h5(path: Path) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        for key in ("data", "points"):
            if key in f:
                return np.asarray(f[key], np.float32).reshape(-1, 3)
        key = list(f.keys())[0]
        return np.asarray(f[key], np.float32).reshape(-1, 3)


def load_point_cloud(path: str) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".ply":
        return load_ply(p)
    if p.suffix in (".txt", ".pts"):
        return load_txt(p)
    if p.suffix == ".h5":
        return load_h5(p)
    raise ValueError(f"unsupported point-cloud format: {p.suffix}")


def resample_with_mask(pc: np.ndarray, num_points: int,
                       rng: np.random.RandomState
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Resample one cloud to exactly ``num_points`` rows: subsample without
    replacement when larger, repeat-pad when smaller. Returns
    (points (num_points, 3), validity mask (num_points,)). The single
    implementation of the pad-by-repeat convention shared by the dataset,
    the alternate dataset and the serving CLI."""
    n = len(pc)
    if n == 0:
        raise ValueError("cannot resample an empty point cloud")
    if n >= num_points:
        idx = rng.choice(n, num_points, replace=False)
        return pc[idx].astype(np.float32), np.ones(num_points, np.float32)
    pad = pc[rng.randint(0, n, num_points - n)]
    mask = np.concatenate([np.ones(n, np.float32),
                           np.zeros(num_points - n, np.float32)])
    return np.concatenate([pc, pad]).astype(np.float32), mask


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class ShapeNetDataset:
    """Fixed-size point-cloud dataset over a directory tree."""

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        num_points: int = 2048,
        categories: Optional[Sequence[str]] = None,
        cache_in_memory: bool = True,
        seed: int = 0,
        split_fractions: Optional[Tuple[float, float, float]] = None,
        workers: int = 8,
    ):
        """``split_fractions`` (train, val, test) activates hash-based
        splitting for flat directory trees with no per-split directories
        (the reference parses these config knobs but never uses them,
        data.train_split/val_split in config.yaml:96-98). ``workers`` is the
        parallel-parse thread count, the analog of the reference's
        DataLoader num_workers (train_rl_gan_net.py:142)."""
        self.data_dir = Path(data_dir)
        self.split = split
        self.num_points = num_points
        self.categories = list(categories) if categories else None
        self.split_fractions = split_fractions
        self.workers = max(int(workers), 1)
        self._rng = np.random.RandomState(seed)
        self.files = self._load_index()
        self._cache: Optional[np.ndarray] = None
        self._cache_lock = threading.Lock()
        if cache_in_memory:
            self._build_cache()

    # -- index ------------------------------------------------------------

    def _load_index(self) -> List[Dict]:
        # fraction-based splits get their own cache key so changing the
        # configured fractions cannot silently reuse a stale index
        suffix = ""
        if self.split_fractions is not None:
            f = self.split_fractions
            suffix = f"_frac{int(f[0] * 100)}_{int(f[1] * 100)}_{int(f[2] * 100)}"
        index_file = self.data_dir / f"{self.split}_data{suffix}.json"
        if index_file.exists():
            with open(index_file) as f:
                files = json.load(f)
        else:
            files = self._scan()
            if files:
                index_file.parent.mkdir(parents=True, exist_ok=True)
                with open(index_file, "w") as f:
                    json.dump(files, f, indent=2)
        if self.categories:
            ids = [CATEGORY_MAPPING.get(c, c) for c in self.categories]
            wanted = set(ids) | set(self.categories)
            files = [e for e in files
                     if e["category"] in wanted
                     or any(i in e["path"] for i in ids)]
        return files

    def _split_of_path(self, p: Path) -> str:
        """Deterministic fraction-based split assignment by path hash."""
        import hashlib

        frac = self.split_fractions
        h = int(hashlib.md5(str(p.name).encode()).hexdigest()[:8], 16)
        u = h / 0xFFFFFFFF
        if u < frac[0]:
            return "train"
        if u < frac[0] + frac[1]:
            return "val"
        return "test"

    def _scan(self) -> List[Dict]:
        files = []
        for ext in ("*.ply", "*.pts", "*.txt", "*.h5"):
            for p in sorted(self.data_dir.rglob(ext)):
                if self.split_fractions is not None:
                    in_split = self._split_of_path(p) == self.split
                else:
                    # match path *components* (or the file stem), not a raw
                    # substring of the full path: a data_dir named e.g.
                    # "train_set" must not swallow every file into 'train'
                    rel = p.relative_to(self.data_dir)
                    parts = [q.lower() for q in rel.parts[:-1]]
                    in_split = (self.split in parts
                                or self.split in p.stem.lower())
                if in_split:
                    files.append({
                        "path": str(p),
                        "category": self._category_of(p),
                        "model_id": p.stem,
                    })
        return files

    @staticmethod
    def _category_of(path: Path) -> str:
        for part in path.parts:
            if part in CATEGORY_MAPPING:
                return part
            for name, cid in CATEGORY_MAPPING.items():
                if part == cid:
                    return name
        return "unknown"

    # -- loading ----------------------------------------------------------

    def _resample(self, pc: np.ndarray) -> np.ndarray:
        pc, _mask = resample_with_mask(pc, self.num_points, self._rng)
        return pc

    def _build_cache(self) -> None:
        with self._cache_lock:
            if self._cache is not None or not self.files:
                return
            paths = [e["path"] for e in self.files]
            if all(p.endswith((".txt", ".pts", ".ply")) for p in paths):
                try:  # C++ parallel parse + resample
                    from gan_rl_3d_tpu.runtime import load_files_parallel
                    self._cache = load_files_parallel(
                        paths, self.num_points,
                        seed=int(self._rng.randint(1, 1 << 30)),
                        workers=self.workers)
                    return
                except (ImportError, OSError):
                    pass
            arr = np.empty((len(self.files), self.num_points, 3), np.float32)
            for i, entry in enumerate(self.files):
                try:
                    arr[i] = self._resample(load_point_cloud(entry["path"]))
                except (ValueError, IOError) as e:
                    raise IOError(
                        f"failed to load {entry['path']!r} "
                        f"({self.split} split): {e}") from e
            self._cache = arr

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict:
        if self._cache is not None:
            pc = self._cache[idx]
        else:
            pc = self._resample(load_point_cloud(self.files[idx]["path"]))
        return {
            "complete_pc": pc,
            "category": self.files[idx]["category"],
            "model_id": self.files[idx]["model_id"],
        }

    def as_array(self) -> np.ndarray:
        """Whole split as one (S, num_points, 3) array."""
        self._build_cache()
        assert self._cache is not None, f"empty dataset at {self.data_dir}"
        return self._cache


# ---------------------------------------------------------------------------
# Batch iteration (replaces torch DataLoader; reference utils/dataset.py:430)
# ---------------------------------------------------------------------------


class BatchLoader:
    """Shuffled fixed-shape batch iterator over a ShapeNetDataset.

    Yields dicts with 'complete_pc' (B, N, 3) float32. The final short batch
    is padded by wrapping around (fixed shapes for jit) with 'pad' marking
    the wrapped rows.
    """

    def __init__(self, dataset: ShapeNetDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, shard_groups: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # shard_groups > 1: shard-ALIGNED shuffling for a row-sharded
        # device-resident split (training.data_residency="sharded"). Batch
        # slot group g draws only rows from dataset group g, both split
        # contiguously into `shard_groups` equal parts — the same layout
        # jax row-sharding uses — so every resident gather is device-local
        # on any mesh whose data axis divides shard_groups, and the plan
        # (hence the trajectory) is mesh-independent. Falls back to the
        # unconstrained permutation when sizes don't divide evenly.
        self.shard_groups = shard_groups
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch_indices(self) -> Tuple[np.ndarray, np.ndarray]:
        """One epoch's batch plan: (indices (S, B) int32, pad (S, B)).

        The trainer ships these few KB to the device instead of the point
        clouds themselves when the dataset is device-resident."""
        n = len(self.dataset)
        bs = self.batch_size
        if self.shard_groups > 1 and n % self.shard_groups == 0 \
                and bs % self.shard_groups == 0:
            return self._grouped_epoch_indices(n, bs)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // bs) * bs if self.drop_last else n
        all_idx, all_pad = [], []
        if stop <= 0:  # empty epoch (tiny dataset with drop_last)
            return (np.zeros((0, bs), np.int32), np.zeros((0, bs), np.float32))
        for start in range(0, stop, bs):
            idx = order[start:start + bs]
            pad = np.zeros((len(idx),), np.float32)
            if len(idx) < bs:  # wrap-around padding keeps shapes static
                # np.resize tiles, so datasets smaller than the batch size
                # still fill the batch
                extra = np.resize(order, bs - len(idx))
                idx = np.concatenate([idx, extra])
                pad = np.concatenate([pad, np.ones((len(extra),), np.float32)])
            all_idx.append(idx)
            all_pad.append(pad)
        return (np.stack(all_idx).astype(np.int32), np.stack(all_pad))

    def _grouped_epoch_indices(self, n: int, bs: int
                               ) -> Tuple[np.ndarray, np.ndarray]:
        """Shard-aligned batch plan (see __init__): group g's slots
        [g*bs/G, (g+1)*bs/G) draw only rows [g*n/G, (g+1)*n/G), each group
        independently permuted by the same RNG stream. The tail batch
        wrap-pads WITHIN each group so padded gathers stay local too."""
        G = self.shard_groups
        m, spg = n // G, bs // G  # rows per group, slots per group
        perms = [g * m + (self._rng.permutation(m) if self.shuffle
                          else np.arange(m)) for g in range(G)]
        stop = (m // spg) * spg if self.drop_last else m
        if stop <= 0:
            return (np.zeros((0, bs), np.int32), np.zeros((0, bs), np.float32))
        all_idx, all_pad = [], []
        for start in range(0, stop, spg):
            chunks, pads = [], []
            for g in range(G):
                idx = perms[g][start:start + spg]
                pad = np.zeros((len(idx),), np.float32)
                if len(idx) < spg:  # wrap within the group
                    extra = np.resize(perms[g], spg - len(idx))
                    idx = np.concatenate([idx, extra])
                    pad = np.concatenate(
                        [pad, np.ones((len(extra),), np.float32)])
                chunks.append(idx)
                pads.append(pad)
            all_idx.append(np.concatenate(chunks))
            all_pad.append(np.concatenate(pads))
        return (np.stack(all_idx).astype(np.int32), np.stack(all_pad))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        data = self.dataset.as_array()
        indices, pads = self.epoch_indices()
        for idx, pad in zip(indices, pads):
            yield {"complete_pc": data[idx], "pad": pad}


def create_dataloader(
    data_dir: str,
    split: str = "train",
    batch_size: int = 32,
    num_points: int = 2048,
    shuffle: Optional[bool] = None,
    seed: int = 0,
    drop_last: bool = False,
    **dataset_kwargs,
) -> BatchLoader:
    """Reference-API-compatible loader factory (utils/dataset.py:430-449)."""
    ds = ShapeNetDataset(data_dir, split=split, num_points=num_points,
                         seed=seed, **dataset_kwargs)
    if shuffle is None:
        shuffle = split == "train"
    return BatchLoader(ds, batch_size, shuffle=shuffle, seed=seed,
                       drop_last=drop_last)


def setup_dataset(data_dir: str, synthetic: bool = False,
                  samples_per_category: int = 100) -> None:
    """Create the dataset directory (reference utils/dataset.py:452-461).
    Real ShapeNet requires manual download; synthetic generates locally."""
    if synthetic:
        create_synthetic_dataset(data_dir,
                                 samples_per_category=samples_per_category)
    else:
        print(
            "Real ShapeNet (latent_3d_points) requires manual download:\n"
            "  1. visit https://github.com/optas/latent_3d_points\n"
            "  2. follow their instructions for the ShapeNet subset\n"
            f"  3. extract under {data_dir} as <split>/<category>/*.ply\n"
            "Or pass synthetic=True for generated data.")
