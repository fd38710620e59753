#!/bin/bash
# z_dim ablation flagship run (see seed_from_best4_ae.py and CLAUDE.md
# open threads): resume from best4's AE at phase lgan, train LGAN(z=8) +
# TD3(action_dim=8) + joint on best4's 12.8k-cloud dataset, then evaluate
# and sweep the 8-d z-landscape.
set -e
cd "$(dirname "$0")"
python /root/repo/train_rl_gan_net.py --config config_z8.yaml \
    --phase full --resume seed_ae 2>&1 | tee train_z8.log
python /root/repo/evaluate.py --config config_z8.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_z8.log
python /root/repo/benchmarks/z_sweep.py --config config_z8.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep.log

# frozen-G joint variant from the SAME pre-joint stack (joint.freeze_
# generator: the z8 oracle degrades when phase 5 shifts G under the
# trained agent, RESULTS.md section 8; this tests the fix). Cheap: joint
# is 4 epochs + D refresh + calibration.
rm -rf checkpoints_fg
cp -r checkpoints checkpoints_fg
rm -f checkpoints_fg/gate_calibration.json
python /root/repo/train_rl_gan_net.py --config config_z8_fg.yaml \
    --phase joint --resume rl_agent_final 2>&1 | tee joint_fg.log
python /root/repo/evaluate.py --config config_z8_fg.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_z8_fg.log
python /root/repo/benchmarks/z_sweep.py --config config_z8_fg.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_fg.log
