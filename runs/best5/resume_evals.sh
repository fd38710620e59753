#!/bin/bash
# Resume the best5 chain from the eval stage (the round-4 session snapshot
# cut eval_best5.log off mid-run). Same four steps as run_best5.sh's tail.
# Timeouts are deliberately far past worst case (tunnel-wedge rule in
# CLAUDE.md: a timeout must never fire mid-TPU-op).
cd "$(dirname "$0")"
timeout 10800 python /root/repo/evaluate.py --config config_best5.yaml \
    --checkpoint joint_calibrated --ablate-z > eval_best5.log 2>&1
echo "eval_best5 rc=$? $(date -u)" >> best5.status
timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_best5.yaml \
    --checkpoint joint_calibrated --num-z 257 > z_sweep.log 2>&1
echo "z_sweep rc=$? $(date -u)" >> best5.status
timeout 10800 python /root/repo/evaluate.py --config config_best5_fg.yaml \
    --checkpoint joint_calibrated --ablate-z > eval_fg.log 2>&1
echo "eval_fg rc=$? $(date -u)" >> best5.status
timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_best5_fg.yaml \
    --checkpoint joint_calibrated --num-z 257 > z_sweep_fg.log 2>&1
echo "z_sweep_fg rc=$? $(date -u)" >> best5.status
# pre-joint stack sweep: quantifies how much phase 5 (unfrozen G) shifted
# the z8 oracle on the TPU stack (runs/zdim/RESULTS.md section 8 saw
# 0.0255 -> 0.0338 on CPU). rl_agent_final predates phase 5.
timeout 10800 python /root/repo/benchmarks/z_sweep.py --config config_best5.yaml \
    --checkpoint rl_agent_final --num-z 257 > z_sweep_prejoint.log 2>&1
echo "z_sweep_prejoint rc=$? $(date -u)" >> best5.status
echo "BEST5 EVAL CHAIN COMPLETE $(date -u)" >> best5.status
