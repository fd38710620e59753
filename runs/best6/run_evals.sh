#!/bin/bash
# best6 adjudication evals (round 5). Training finished in round 4; the
# eval tail of run_best6.sh never ran (TPU session ended at the first
# z-sweep). This script is that tail, plus the fusion study.
# Sequential on purpose: one TPU client at a time.
set -x
cd "$(dirname "$0")"

# 1. pre-joint 257-candidate stratified sweep: ground truth for the
#    preserve_gan_path prediction (post-joint preserved oracle == this).
python /root/repo/benchmarks/z_sweep.py --config config_best6.yaml \
    --checkpoint rl_agent_final --num-z 257 2>&1 | tee z_sweep_prejoint.log

# 2. full-test z-policy ablation, preserved variant
python /root/repo/evaluate.py --config config_best6.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_best6.log

# 3. post-joint sweep, preserved variant
python /root/repo/benchmarks/z_sweep.py --config config_best6.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_best6.log

# 4+5. same pair for the plain variant
python /root/repo/evaluate.py --config config_best6_plain.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_plain.log
python /root/repo/benchmarks/z_sweep.py --config config_best6_plain.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_plain.log

# 6+7. severe corruption (50-80% holes): calibrated gate vs pure paths
python /root/repo/runs/best5/severe_best5.py config_best6.yaml \
    joint_calibrated 2>&1 | tee severe_best6.log
python /root/repo/runs/best5/severe_best5.py config_best6_plain.yaml \
    joint_calibrated 2>&1 | tee severe_plain.log

# 8+9. fusion study: the only designed path below the per-sample gate's
#      measured ceiling (val oracle 0.022772 ~= calibrated 0.022814).
python fusion_study.py config_best6.yaml joint_calibrated \
    2>&1 | tee fusion_best6.log
python fusion_study.py config_best6.yaml joint_calibrated --severe \
    2>&1 | tee fusion_severe.log

echo "BEST6 EVALS COMPLETE $(date)"
