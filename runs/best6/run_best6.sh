#!/bin/bash
# Round-4 (cont.): joint.preserve_gan_path A/B at flagship scale.
# Main chain = the shipped z8 recipe (config.yaml) + preserve_gan_path:
# phase 5 snapshots the pre-joint (G, decoder) pair and serving routes the
# GAN branch through it, so joint cannot degrade the GAN path's oracle
# (the measured pathology: 0.0233 -> ~0.032 through joint regardless of
# freeze_generator — runs/best5/RESULTS.md). The plain variant re-runs
# phase 5 from the SAME pre-joint checkpoints for a controlled A/B.
set -e
cd "$(dirname "$0")"

time python /root/repo/train_rl_gan_net.py --config config_best6.yaml \
    --phase full 2>&1 | tee train_best6.log

# plain-joint A/B from the same pre-joint stack (copy only rl_agent_final
# so no stale siblings can leak between variants)
rm -rf checkpoints_plain && mkdir checkpoints_plain
cp -r checkpoints/rl_agent_final checkpoints_plain/
python /root/repo/train_rl_gan_net.py --config config_best6_plain.yaml \
    --phase joint --resume rl_agent_final 2>&1 | tee joint_plain.log

# evals: full-test z-policy ablation + stratified 257-candidate z sweep
# (pre-joint sweep first: with preserve_gan_path the post-joint oracle
# should match it EXACTLY — the A/B's ground truth)
python /root/repo/benchmarks/z_sweep.py --config config_best6.yaml \
    --checkpoint rl_agent_final --num-z 257 2>&1 | tee z_sweep_prejoint.log
python /root/repo/evaluate.py --config config_best6.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_best6.log
python /root/repo/benchmarks/z_sweep.py --config config_best6.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_best6.log
python /root/repo/evaluate.py --config config_best6_plain.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_plain.log
python /root/repo/benchmarks/z_sweep.py --config config_best6_plain.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_plain.log

# severe corruption (50-80% holes): calibrated gate vs pure paths, both
# variants — the regime where the preserved GAN path should matter most
python /root/repo/runs/best5/severe_best5.py config_best6.yaml \
    joint_calibrated 2>&1 | tee severe_best6.log
python /root/repo/runs/best5/severe_best5.py config_best6_plain.yaml \
    joint_calibrated 2>&1 | tee severe_plain.log
echo "BEST6 CHAIN COMPLETE $(date)"
