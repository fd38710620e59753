"""Device mesh + sharding helpers.

Strategy (scaling-book style): a 2D logical mesh ("data", "model").

* Batches shard along "data" — XLA inserts psum all-reduces over ICI for
  gradient accumulation inside jitted train steps.
* Parameters are replicated by default; the decoder's wide final matmul
  (256 x 6144) and other large layers can shard their output dimension
  along "model" via ``shard_model_for_mesh`` (tensor parallelism).

Everything goes through `jax.jit` + `NamedSharding` constraints — no manual
collectives; XLA chooses ICI-optimal reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis — the right layout for this model family's sizes."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} mesh needs {n_data * n_model} devices, "
        f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) axis along "data"."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Fixed group count for shard-aligned resident-data shuffling
# (training.data_residency="sharded"): the same 8-way contract as
# nn._BN_GROUPS — plans are computed for 8 groups regardless of mesh, so
# trajectories are mesh-independent and gathers are device-local on any
# data axis that divides 8 (larger meshes still run, with cross-device
# gathers inside each group — values identical, just slower).
DATA_SHARD_GROUPS = 8


def row_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard a device-resident dataset's leading (sample) axis along
    "data" — 1/n_data of the split per device instead of a full replica
    (docs/SCALING.md "Resident-dataset memory model")."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree, *, process_local: bool = False):
    """Device-put every array in a batch pytree, sharded on the batch axis.

    ``process_local=False`` (single-host): every array is the full global
    batch and ``jax.device_put`` splits it across the mesh.

    ``process_local=True`` (multi-host): each process passes only ITS shard
    of the global batch — ``global_batch // process_count`` rows, the slice
    returned by ``process_local_slice`` — and
    ``jax.make_array_from_process_local_data`` assembles the global sharded
    array without any cross-host copy of cloud data (docs/SCALING.md
    "Extending beyond one host"). Single-process, this degenerates to the
    plain path (local data == global data), which is how it is unit-tested.
    """
    if not process_local:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, ndim=x.ndim)),
            tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, ndim=x.ndim), np.asarray(x)), tree)


def process_local_slice(global_batch: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """Row range of the global batch that THIS process must load and feed
    when using ``shard_batch(..., process_local=True)``.

    The "data" mesh axis is laid out process-major (jax.devices() orders
    devices by process), so process p owns the contiguous rows
    [p*B/P, (p+1)*B/P). ``global_batch`` must divide evenly by the process
    count — fixed shapes everywhere, per the framework invariant."""
    process_index = (jax.process_index() if process_index is None
                     else process_index)
    process_count = (jax.process_count() if process_count is None
                     else process_count)
    if global_batch % process_count != 0:
        raise ValueError(
            f"global batch {global_batch} must divide evenly across "
            f"{process_count} processes (fixed shapes everywhere)")
    per = global_batch // process_count
    return slice(process_index * per, (process_index + 1) * per)


# modules whose wide layers benefit from tensor parallelism: the decoder's
# 256 x 6144 head and the 512-wide latent-GAN layers. Everything else
# (encoder <=256 wide, actor/critic <=432 wide) stays replicated — at those
# sizes the all-gather cost exceeds the matmul saving.
_TP_MODULES = ("decoder", "generator", "discriminator")


def _spec_for_param(path: str, leaf) -> P:
    """Tensor-parallel layout: shard dense kernels' output dim along
    "model" for the explicitly allowlisted wide modules; replicate
    everything else. ``path`` is jax.tree_util.keystr of the leaf."""
    if not any(m in path for m in _TP_MODULES):
        return P()
    if leaf.ndim == 2 and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 512:
        return P(None, MODEL_AXIS)
    if leaf.ndim == 1 and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 512:
        return P(MODEL_AXIS)
    return P()


def shard_model_for_mesh(mesh: Mesh, model_tree):
    """Place a params/state pytree on the mesh: big kernels tensor-sharded
    along "model" (no-op on a 1-wide model axis), the rest replicated."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.device_put(model_tree, replicated(mesh))

    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, _spec_for_param(path, leaf)))

    return jax.tree_util.tree_map_with_path(
        lambda p, x: place(jax.tree_util.keystr(p), x), model_tree)
