#!/bin/bash
# d16 exploration-collapse study (round 5, VERDICT #8).
# runs/zdim/train_z16_tpu.log timeline: behavior reward flat through the
# actor freeze (warmup ends ep 2000), survives the LR ramp (full at ep
# 3500), then plunges -10.5 -> -15.5 at ep 3904-4544 and takes ~10k
# episodes to recover. Hypothesis: with OU exploration covering 16-d
# z-space thinly, 2000 episodes of critic data can't pin the Q-surface
# off-manifold; the moment the actor runs at full LR it ascends a spurious
# Q-ridge (classic actor-critic extrapolation error). Mitigation arm uses
# the EXISTING knobs: actor_warmup 2000->4000, actor_lr_ramp 1500->6000.
# Both arms share the same d16 LGAN trained on the best6 (120-epoch) AE.
set -x
cd "$(dirname "$0")"

if [ ! -d ckpt_base/lgan_final ]; then
    # transplant ONLY the AE (z-independent) into a fresh d16 model —
    # resuming best6's full checkpoint drags its z8 LGAN/agent params in
    # (shape crash; same pitfall round 4 hit, runs/zdim/seed_ae_generic.py)
    python /root/repo/runs/zdim/seed_ae_generic.py \
        --source-config /root/repo/runs/best6/config_best6.yaml \
        --source-ckpt /root/repo/runs/best6/checkpoints/autoencoder_best \
        --target-config config_d16_base.yaml
    python /root/repo/train_rl_gan_net.py --config config_d16_base.yaml \
        --phase lgan --resume seed_ae 2>&1 | tee lgan_d16.log
fi
rm -rf ckpt_slow && mkdir ckpt_slow
cp -r ckpt_base/lgan_final ckpt_slow/

python /root/repo/train_rl_gan_net.py --config config_d16_base.yaml \
    --phase rl_agent --resume lgan_final 2>&1 | tee rl_d16_base.log
python /root/repo/train_rl_gan_net.py --config config_d16_slow.yaml \
    --phase rl_agent --resume lgan_final 2>&1 | tee rl_d16_slow.log
echo "D16 STUDY COMPLETE $(date)"
