#!/usr/bin/env python
"""Train RL-GAN-Net on TPU.

CLI parity with reference train_rl_gan_net.py:597-645:
  --config  path to YAML config (reference schema)
  --phase   autoencoder | lgan | rl_agent | joint | full
  --resume  checkpoint name to restore before training
"""

import argparse

from gan_rl_3d_tpu.train import RLGANNetTrainer


def parse_arguments():
    parser = argparse.ArgumentParser(description="Train RL-GAN-Net (TPU)")
    parser.add_argument("--config", type=str, default="configs/config.yaml",
                        help="Path to configuration file")
    parser.add_argument("--phase", type=str,
                        choices=["autoencoder", "lgan", "rl_agent", "joint",
                                 "full"],
                        default="full", help="Training phase to run")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint name to resume from")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler device trace into "
                             "<log_dir>/profile")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans: fail fast with a "
                             "traceback at the first non-finite value")
    return parser.parse_args()


def main():
    from gan_rl_3d_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = parse_arguments()
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    trainer = RLGANNetTrainer(args.config)
    resumed = bool(args.resume) and trainer.load_checkpoint(args.resume)
    from gan_rl_3d_tpu.utils.profiling import trace

    try:
        with trace(f"{trainer.config.training.log_dir}/profile",
                   enabled=args.profile):
            if args.phase == "autoencoder":
                trainer.train_autoencoder()
            elif args.phase == "lgan":
                trainer.generate_gfvs()
                trainer.train_latent_gan()
            elif args.phase == "rl_agent":
                trainer.train_rl_agent()
            elif args.phase == "joint":
                trainer.joint_training()
                trainer.post_joint_refresh()
            else:
                trainer.train_full_pipeline(
                    start_phase=None if resumed else "autoencoder")
    except KeyboardInterrupt:
        print("\nTraining interrupted by user")
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
