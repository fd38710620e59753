#!/bin/bash
# z_dim=16 TPU flagship: completes the capture curve (d=1: 9.6%,
# d=8: 86% — runs/best5/RESULTS.md; d=16: ?). Same recipe/budget/data as
# best5, only the latent action space widens. Seeded from the best5 AE
# (the AE is z-independent), so phases 3->5.5 run from seed_ae.
# Timeouts far past worst case (tunnel-wedge rule: a timeout must never
# fire mid-TPU-op).
set -e
cd "$(dirname "$0")"

python seed_ae_generic.py \
    --source-config /root/repo/runs/best5/config_best5.yaml \
    --source-ckpt /root/repo/runs/best5/checkpoints/autoencoder_best \
    --target-config config_z16.yaml

timeout 14400 python /root/repo/train_rl_gan_net.py --config config_z16.yaml \
    --phase full --resume seed_ae > train_z16_tpu.log 2>&1
echo "z16 train rc=$? $(date -u)" >> z16tpu.status

timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_z16.yaml \
    --checkpoint rl_agent_final --num-z 257 > z_sweep_z16_prejoint.log 2>&1
echo "z16 prejoint sweep rc=$? $(date -u)" >> z16tpu.status

timeout 10800 python /root/repo/evaluate.py --config config_z16.yaml \
    --checkpoint joint_calibrated --ablate-z > eval_z16_tpu.log 2>&1
echo "z16 eval rc=$? $(date -u)" >> z16tpu.status

timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_z16.yaml \
    --checkpoint joint_calibrated --num-z 257 > z_sweep_z16_joint.log 2>&1
echo "z16 joint sweep rc=$? $(date -u)" >> z16tpu.status
echo "Z16 TPU CHAIN COMPLETE $(date -u)" >> z16tpu.status
