"""gan_rl_3d_tpu — a TPU-native (JAX/XLA/Pallas) framework for real-time 3D
point-cloud shape completion with the capabilities of RL-GAN-Net.

Re-designed from scratch for TPU hardware rather than ported:

* pure-functional models — parameters and mutable state (BatchNorm running
  stats, spectral-norm power-iteration vectors) are explicit pytrees,
* one jitted train step per curriculum phase,
* fixed shapes + validity masks instead of variable-length point clouds,
* Pallas kernels for the Chamfer pairwise-minimum and the fused
  PointNet encoder inference path,
* data parallelism over a `jax.sharding.Mesh` (ICI collectives inserted by
  XLA), with a model axis available for sharding the decoder's wide matmul.

Reference capability map: see /root/repo/SURVEY.md (layer map §1,
component inventory §2).
"""

__version__ = "0.1.0"

from gan_rl_3d_tpu import nn  # noqa: F401
