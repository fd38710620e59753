#!/usr/bin/env python
"""Set up the ShapeNet dataset (CLI parity with reference setup_dataset.py)."""

import argparse
from pathlib import Path

from gan_rl_3d_tpu.data import create_dataloader, setup_dataset


def main():
    parser = argparse.ArgumentParser(description="Setup RL-GAN-Net dataset")
    parser.add_argument("--data-dir", type=str, default="./data/shapenet")
    parser.add_argument("--synthetic", action="store_true",
                        help="Create synthetic dataset for testing")
    parser.add_argument("--samples-per-category", type=int, default=100)
    parser.add_argument("--test", action="store_true",
                        help="Test data loading after setup")
    args = parser.parse_args()

    print(f"Setting up dataset at {args.data_dir} "
          f"(synthetic={args.synthetic})")
    setup_dataset(args.data_dir, synthetic=args.synthetic,
                  samples_per_category=args.samples_per_category)

    if args.test:
        loader = create_dataloader(args.data_dir, split="train", batch_size=4)
        print(f"Train dataset size: {len(loader.dataset)}")
        batch = next(iter(loader))
        print(f"Batch keys: {list(batch.keys())}")
        print(f"Complete point cloud shape: {batch['complete_pc'].shape}")
        val = create_dataloader(args.data_dir, split="test", batch_size=4)
        print(f"Validation dataset size: {len(val.dataset)}")
        print("Data loading test passed")

    print(f"Dataset location: {Path(args.data_dir).absolute()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
