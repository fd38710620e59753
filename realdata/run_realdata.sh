#!/bin/bash
# Exercise the real-data serving path on files this project did not
# generate: the reference's 18 committed real point-cloud artifacts
# (/root/reference/results/point_clouds/*.ply — ASCII PLY with color
# columns, 1200-2048 points; the format its loader at
# reference utils/dataset.py:204-228 targets). Closes PARITY row 13's
# "never exercised on real data" caveat (VERDICT r2 ask #4).
#
# 1. checkpoint mode: complete all 18 through the full jitted pipeline
# 2. engine mode: same through the exported folded deployment engine
# 3. score_reference_artifacts.py: chamfer of our completions vs the
#    reference's own committed ground truths + its own reconstructions
set -e
cd /root/repo/runs/best3
REF=/root/reference/results/point_clouds
OUT=/root/repo/realdata

python /root/repo/complete_clouds.py --config config_best3.yaml \
    --checkpoint joint_calibrated --batch-size 8 \
    --output-dir "$OUT/completed_ckpt" "$REF"/*.ply \
    2>&1 | grep -v WARNING | tee "$OUT/complete_ckpt.log"

python /root/repo/evaluate.py --config config_best3.yaml \
    --checkpoint joint_calibrated --num-export 0 \
    --export-engine "$OUT/engine_best3.pkl" \
    2>&1 | grep -v WARNING | tail -3 > "$OUT/export_engine.log"

python /root/repo/complete_clouds.py --config config_best3.yaml \
    --engine "$OUT/engine_best3.pkl" --batch-size 8 \
    --output-dir "$OUT/completed_engine" "$REF"/*_incomplete.ply \
    2>&1 | grep -v WARNING | tee "$OUT/complete_engine.log"

python "$OUT/score_reference_artifacts.py" \
    2>&1 | grep -v WARNING | tee "$OUT/score.log"
