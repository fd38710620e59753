#!/bin/bash
# d=2 oracle point for the z_dim curve (CPU, minutes — LGAN trains on
# the GFV cache already extracted from the best5 AE in shapenet_z16/gfv,
# same seed AE as the d=4/16 points so the curve stays comparable).
#
# Question this answers: §11 shows the sampled oracle saturating by d=4
# (0.0254) from d=1's 0.0370 — does it saturate already at d=2, or is
# d=2 intermediate? Pins down how many latent dims the per-sample signal
# actually needs.
cd "$(dirname "$0")"

run_cpu () {  # run_cpu <logfile> <tag> <entry> <argv...>
    local log="$1" tag="$2"; shift 2
    nice -n 19 timeout 14400 python -u cpu_run.py "$@" > "$log" 2>&1
    echo "$tag rc=$? $(date -u)" >> z2.status
}

TRAIN=/root/repo/train_rl_gan_net.py
SWEEP=/root/repo/benchmarks/z_sweep.py

run_cpu seed_z2.log z2-seed seed_ae_generic.py \
    --source-config /root/repo/runs/best5/config_best5.yaml \
    --source-ckpt /root/repo/runs/best5/checkpoints/autoencoder_best \
    --target-config config_z2_cpu.yaml
run_cpu lgan_cpu_z2.log z2-lgan "$TRAIN" --config config_z2_cpu.yaml --phase lgan --resume seed_ae
run_cpu z_sweep_cpu_d2.log z2-sweep129 "$SWEEP" --config config_z2_cpu.yaml --checkpoint lgan_final --num-z 129 --batch 128
run_cpu z_sweep_cpu_d2_257.log z2-sweep257 "$SWEEP" --config config_z2_cpu.yaml --checkpoint lgan_final --num-z 257 --batch 128

echo "Z2 CHAIN COMPLETE $(date -u)" >> z2.status
