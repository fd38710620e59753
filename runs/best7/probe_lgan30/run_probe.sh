#!/bin/bash
# LGAN-budget probe (round 5): best7 showed the 200-epoch AE's GFV
# manifold degrades the 10-epoch LGAN badly (pre-joint sampled oracle
# 0.0607 vs 0.0225 on the 120-epoch AE). Question: is LGAN *budget* the
# fix? Train the LGAN 30 epochs (3x) on best7's own AE + cached GFVs and
# read the 257-candidate pre-joint oracle — no RL needed for the oracle
# row. If the oracle recovers toward 0.0225, a best8 chain with
# lgan.epochs: 30 is warranted.
set -e
cd "$(dirname "$0")"
mkdir -p ckpt_lgan30
cp -r ../checkpoints/autoencoder_best ckpt_lgan30/
# reuse best7's extracted GFVs (same AE weights -> identical pairs)
mkdir -p ckpt_lgan30/gfv && cp ../checkpoints/gfv/gfvs_train.npz ckpt_lgan30/gfv/

python /root/repo/train_rl_gan_net.py --config config_lgan30.yaml \
    --phase lgan --resume autoencoder_best 2>&1 | tee lgan30.log

python /root/repo/benchmarks/z_sweep.py --config config_lgan30.yaml \
    --checkpoint lgan_final --num-z 257 2>&1 | tee z_sweep_lgan30.log
echo "LGAN30 PROBE COMPLETE $(date)"
