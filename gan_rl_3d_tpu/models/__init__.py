"""Model family: PointNet autoencoder, latent WGAN-GP, TD3 agent, and the
RL-GAN-Net composite (reference models/ — SURVEY.md §2 rows 2-11).

All models are functional: ``*_init`` returns (params, state) pytrees and
``*_apply`` returns (output, new_state). BatchNorm running statistics and
spectral-norm power-iteration vectors live in ``state``.
"""

from gan_rl_3d_tpu.models import autoencoder  # noqa: F401
from gan_rl_3d_tpu.models import latent_gan  # noqa: F401
from gan_rl_3d_tpu.models import rl_agent  # noqa: F401
from gan_rl_3d_tpu.models import rl_gan_net  # noqa: F401
