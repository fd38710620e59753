"""Mesh / sharding layer: data parallelism over ICI, with a model axis for
sharding wide matmuls. The reference has no distributed support at all
(SURVEY.md §2 'Distributed communication backend: none'); this layer is new
TPU-native capability, not a port.
"""

from gan_rl_3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_model_for_mesh,
)
