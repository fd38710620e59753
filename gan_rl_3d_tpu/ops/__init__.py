"""TPU-native compute ops: Chamfer distance kernels, point-cloud transforms,
losses and the RL reward.

Reference capabilities covered: utils/losses.py and utils/data_utils.py of
/root/reference (see SURVEY.md §2 rows 12, 14).
"""

from gan_rl_3d_tpu.ops.chamfer import (  # noqa: F401
    chamfer_distance,
    chamfer_distance_l2,
    nearest_distances,
    pairwise_sqdist,
)
from gan_rl_3d_tpu.ops import pointcloud  # noqa: F401
from gan_rl_3d_tpu.ops import losses  # noqa: F401
