#!/bin/bash
# Multi-step episode A/B (round 5, VERDICT #6): the shipped recipe runs
# 5-step episodes (training.rl_agent.max_steps_per_episode: 5; the
# reference hardcodes 10 one-sample python steps, train_rl_gan_net.py:404).
# The 5-step arm IS best6's phase 4 (runs/best6/train_best6.log +
# z_sweep_prejoint.log: greedy-eval curve, agent 0.038639, 64.5% capture).
# This runs the 1-step arm from the SAME pre-joint AE+LGAN stack and seed,
# then the same stratified 257-candidate sweep.
set -x
cd "$(dirname "$0")"

rm -rf checkpoints_steps1 && mkdir checkpoints_steps1
cp -r ../best6/checkpoints/lgan_final checkpoints_steps1/

python /root/repo/train_rl_gan_net.py --config config_steps1.yaml \
    --phase rl_agent --resume lgan_final 2>&1 | tee train_steps1.log

python /root/repo/benchmarks/z_sweep.py --config config_steps1.yaml \
    --checkpoint rl_agent_final --num-z 257 2>&1 | tee z_sweep_steps1.log
echo "STEPS A/B COMPLETE $(date)"
