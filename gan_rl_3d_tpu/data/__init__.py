"""Data layer: multi-format point-cloud datasets, synthetic generation, and
a host->device pipeline feeding fixed-shape batches (reference
utils/dataset.py + utils/data_utils.py — SURVEY.md §2 rows 13-17).

Division of labour, TPU-first: the host only does file IO and batching of
*complete* clouds; hole-cutting, augmentation and normalisation run on
device inside the jitted train step (gan_rl_3d_tpu.ops.pointcloud).
"""

from gan_rl_3d_tpu.data.dataset import (  # noqa: F401
    ShapeNetDataset,
    create_dataloader,
)
from gan_rl_3d_tpu.data.synthetic import (  # noqa: F401
    create_synthetic_dataset,
    generate_synthetic_cloud,
)
from gan_rl_3d_tpu.data.dataset import setup_dataset  # noqa: F401
