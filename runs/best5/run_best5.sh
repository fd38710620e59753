#!/bin/bash
# Round-4 headline: z_dim=8 flagship ON THE TPU, from scratch.
# = best4's 12.8k-cloud recipe + lgan.z_dim 8 / rl action_dim 8 (the
# runs/zdim mechanism study's winner) + precision bf16_selective (the
# runs/bf16 recipe) + 22k-episode RL budget. After the standard
# pipeline, a joint.freeze_generator variant re-runs phase 5 from the
# SAME pre-joint stack (the z8 oracle degrades when phase 5 shifts G
# under the trained agent — runs/zdim/RESULTS.md section 8).
set -e
cd "$(dirname "$0")"

time python /root/repo/train_rl_gan_net.py --config config_best5.yaml \
    --phase full 2>&1 | tee train_best5.log

# frozen-G joint variant from the same pre-joint checkpoints
rm -rf checkpoints_fg
cp -r checkpoints checkpoints_fg
rm -f checkpoints_fg/gate_calibration.json
python /root/repo/train_rl_gan_net.py --config config_best5_fg.yaml \
    --phase joint --resume rl_agent_final 2>&1 | tee joint_fg.log

# evals: full-test z-policy ablation + stratified z-landscape sweep, both stacks
python /root/repo/evaluate.py --config config_best5.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_best5.log
python /root/repo/benchmarks/z_sweep.py --config config_best5.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep.log
python /root/repo/evaluate.py --config config_best5_fg.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_fg.log
python /root/repo/benchmarks/z_sweep.py --config config_best5_fg.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_fg.log
echo "BEST5 CHAIN COMPLETE $(date)"
