#!/bin/bash
# Complete the z_dim oracle curve (d = 1, 4, 8, 16) on CPU.
#
# The round-4 VM rotation wiped all gitignored checkpoints, so this
# rebuilds the z16 study (and adds a z4 point) from the fresh best5 AE:
# seed_ae_generic.py has already copied runs/best5/checkpoints/
# autoencoder_best into checkpoints_cpu_z16/ and checkpoints_cpu_z4/.
# Both studies share runs/zdim/shapenet_z16 (a copy of the best4
# dataset with its own gfv/ cache so nothing races the TPU-side jobs);
# the first lgan run extracts GFVs from the seed AE on CPU.
#
# CPU-only (forced in-process via cpu_run.py — JAX_PLATFORMS=cpu does
# NOT disable the axon plugin, CLAUDE.md), nice'd so it never contends
# with TPU-side host feeding on this 1-core host.
cd "$(dirname "$0")"

run_cpu () {  # run_cpu <logfile> <tag> <entry> <argv...>
    local log="$1" tag="$2"; shift 2
    nice -n 19 timeout 14400 python -u cpu_run.py "$@" > "$log" 2>&1
    echo "$tag rc=$? $(date -u)" >> zcurve.status
}

TRAIN=/root/repo/train_rl_gan_net.py
SWEEP=/root/repo/benchmarks/z_sweep.py

run_cpu lgan_cpu_z16.log z16-lgan "$TRAIN" --config config_z16_cpu.yaml --phase lgan --resume seed_ae
run_cpu z_sweep_cpu_d16.log z16-sweep129 "$SWEEP" --config config_z16_cpu.yaml --checkpoint lgan_final --num-z 129 --batch 128
run_cpu z_sweep_cpu_d16_257.log z16-sweep257 "$SWEEP" --config config_z16_cpu.yaml --checkpoint lgan_final --num-z 257 --batch 128

run_cpu lgan_cpu_z4.log z4-lgan "$TRAIN" --config config_z4_cpu.yaml --phase lgan --resume seed_ae
run_cpu z_sweep_cpu_d4.log z4-sweep129 "$SWEEP" --config config_z4_cpu.yaml --checkpoint lgan_final --num-z 129 --batch 128
run_cpu z_sweep_cpu_d4_257.log z4-sweep257 "$SWEEP" --config config_z4_cpu.yaml --checkpoint lgan_final --num-z 257 --batch 128

echo "ZCURVE CHAIN COMPLETE $(date -u)" >> zcurve.status
