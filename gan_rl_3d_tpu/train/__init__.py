"""Training: one jitted step per curriculum phase, a device-resident replay
buffer, and the 5-phase trainer (reference train_rl_gan_net.py — SURVEY.md
§2 row 1, §3 call stacks).
"""

from gan_rl_3d_tpu.train import replay_buffer  # noqa: F401
from gan_rl_3d_tpu.train import steps  # noqa: F401
from gan_rl_3d_tpu.train.trainer import RLGANNetTrainer  # noqa: F401
