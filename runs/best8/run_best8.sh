#!/bin/bash
# best8 (round 5): does a 3x LGAN budget on the 200-epoch AE's manifold
# improve the post-joint GAN path — and with it the union fusion mode?
# The probe (runs/best7/probe_lgan30) measured pre-joint sampled oracle
# 0.0607 (10 ep) -> 0.0443 (30 ep); best7 then showed joint repairs the
# path further (0.0607 -> 0.0351 oracle, agent 0.0281). This chain
# reuses best7's AE (identical weights + GFV cache, so the AE path and
# its headline are held fixed) and retrains RL + joint on the 30-epoch
# LGAN. Phases run explicitly (rl_agent, then joint+5.5) because
# train_full_pipeline's resume restarts AT the stored phase.
set -e
cd "$(dirname "$0")"
mkdir -p checkpoints
cp -r ../best7/probe_lgan30/ckpt_lgan30/* checkpoints/

python /root/repo/train_rl_gan_net.py --config config_best8.yaml \
    --phase rl_agent --resume lgan_final 2>&1 | tee rl_best8.log

python /root/repo/train_rl_gan_net.py --config config_best8.yaml \
    --phase joint --resume rl_agent_final 2>&1 | tee joint_best8.log

python /root/repo/benchmarks/z_sweep.py --config config_best8.yaml \
    --checkpoint rl_agent_final --num-z 257 2>&1 | tee z_sweep_prejoint.log

python /root/repo/evaluate.py --config config_best8.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_best8.log

python /root/repo/benchmarks/z_sweep.py --config config_best8.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_best8.log

python /root/repo/runs/best6/fusion_study.py config_best8.yaml \
    joint_calibrated 2>&1 | tee fusion_best8.log

python /root/repo/runs/best6/fusion_study.py config_best8.yaml \
    joint_calibrated --severe 2>&1 | tee fusion_severe_best8.log

python /root/repo/runs/best5/severe_best5.py config_best8.yaml \
    joint_calibrated 2>&1 | tee severe_best8.log

echo "BEST8 CHAIN COMPLETE $(date)"
