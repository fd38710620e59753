#!/bin/bash
# z_dim=4 TPU flagship: the last point on the capture curve
# (d=1: 9.6%, d=8: 86%, d=16: 67.6% — runs/zdim/RESULTS.md §12).
# §11 showed the sampled oracle saturates at d≈4, so if exploration
# cost is what hurt d=16, d=4 should capture at least as well as d=8
# at the same 22k-episode budget — this run tests that directly.
# Same recipe/budget/data/seed as best5 and the z16 twin; seeded from
# the best5 AE (the AE is z-independent), so phases 3->5.5 run from
# seed_ae. Timeouts far past worst case (tunnel-wedge rule: a timeout
# must never fire mid-TPU-op).
set -e
cd "$(dirname "$0")"

python seed_ae_generic.py \
    --source-config /root/repo/runs/best5/config_best5.yaml \
    --source-ckpt /root/repo/runs/best5/checkpoints/autoencoder_best \
    --target-config config_z4.yaml

timeout 14400 python /root/repo/train_rl_gan_net.py --config config_z4.yaml \
    --phase full --resume seed_ae > train_z4_tpu.log 2>&1
echo "z4 train rc=$? $(date -u)" >> z4tpu.status

timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_z4.yaml \
    --checkpoint rl_agent_final --num-z 257 > z_sweep_z4_prejoint.log 2>&1
echo "z4 prejoint sweep rc=$? $(date -u)" >> z4tpu.status

timeout 10800 python /root/repo/evaluate.py --config config_z4.yaml \
    --checkpoint joint_calibrated --ablate-z > eval_z4_tpu.log 2>&1
echo "z4 eval rc=$? $(date -u)" >> z4tpu.status

timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_z4.yaml \
    --checkpoint joint_calibrated --num-z 257 > z_sweep_z4_joint.log 2>&1
echo "z4 joint sweep rc=$? $(date -u)" >> z4tpu.status
echo "Z4 TPU CHAIN COMPLETE $(date -u)" >> z4tpu.status
