#!/bin/bash
# best7 (round 5): the SHIPPED recipe run end-to-end — first full chain
# with the 200-epoch cosine AE (runs/ae_frontier: 0.022436 val, the
# measured AE-frontier best). Everything else is the adjudicated best6
# plain recipe (z8, bf16_selective, 22k x 5-step RL, joint w_ae_recon +
# D refresh + gate calibration, preserve_gan_path off). The VM rotation
# wiped all checkpoints + the dataset, so the chain reruns from seed 42
# on a deterministically regenerated runs/best4/shapenet (12.8k clouds).
# Expected: AE val reproduces 0.022436 exactly; headline beats best6's
# 0.022796 test chamfer.
set -e
cd "$(dirname "$0")"

time python /root/repo/train_rl_gan_net.py --config config_best7.yaml \
    --phase full 2>&1 | tee train_best7.log

# pre-joint stratified 257-candidate z-sweep (oracle + agent capture)
python /root/repo/benchmarks/z_sweep.py --config config_best7.yaml \
    --checkpoint rl_agent_final --num-z 257 2>&1 | tee z_sweep_prejoint.log

# headline: full-test z-policy ablation on the FINAL calibrated checkpoint
python /root/repo/evaluate.py --config config_best7.yaml \
    --checkpoint joint_calibrated --ablate-z 2>&1 | tee eval_best7.log

# post-joint sweep (GAN-path degradation through joint, plain variant)
python /root/repo/benchmarks/z_sweep.py --config config_best7.yaml \
    --checkpoint joint_calibrated --num-z 257 2>&1 | tee z_sweep_best7.log

# severe corruption (50-80% holes): calibrated gate vs pure paths
python /root/repo/runs/best5/severe_best5.py config_best7.yaml \
    joint_calibrated 2>&1 | tee severe_best7.log

echo "BEST7 CHAIN COMPLETE $(date)"
