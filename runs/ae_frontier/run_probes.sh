#!/bin/bash
# AE-frontier ladder (round 5, VERDICT #3): push the AE path below the
# 120-epoch recipe's 0.022511 val chamfer. Baseline = runs/best6/ae120.log
# (120 epochs, StepLR step-20, bf16_selective, seed 42, B=64). One lever
# per probe, identical everything else; bf16_recipe_probe methodology.
#   cos120  — cosine LR at the SAME 120-epoch budget (schedule shape)
#   cos200  — cosine LR at 200 epochs (budget + shape)
#   curr120 — 3-stage easy->target hole curriculum (new knob)
#   wide120 — encoder trunk 256->512 (capacity, config-selectable)
set -x
cd "$(dirname "$0")"
for p in cos120 cos200 curr120 wide120; do
    python /root/repo/train_rl_gan_net.py --config config_${p}.yaml \
        --phase autoencoder 2>&1 | tee ae_${p}.log
done
echo "AE FRONTIER PROBES COMPLETE $(date)"
