#!/bin/bash
# Chained z8 follow-up (runs after the joint phase, PID passed as $1):
#  1. eval joint_calibrated (--ablate-z, full test split)
#  2. post-joint stratified z-sweep
#  3. chamfer-only-reward RL ablation (22k episodes from lgan_final)
#  4. stratified z-sweep of the ablation agent
cd /root/repo/runs/zdim
while kill -0 "$1" 2>/dev/null; do sleep 60; done
sleep 5
if [ ! -e checkpoints_cpu/joint_calibrated/_CHECKPOINT_METADATA ]; then
  echo "joint_calibrated missing; aborting chain" > z8_followup.status
  exit 1
fi
echo "joint done; eval starting $(date -u)" > z8_followup.status

timeout 5400 python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['evaluate', '--config', 'config_z8_cpu_rl2.yaml', '--checkpoint', 'joint_calibrated', '--ablate-z', '--metrics', 'chamfer_distance,completion_ratio,hausdorff_distance,f_score', '--num-export', '0']
import runpy; runpy.run_path('/root/repo/evaluate.py', run_name='__main__')
" > eval_z8_joint_cpu.log 2>&1
echo "eval done; sweep starting $(date -u)" >> z8_followup.status

timeout 3600 python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['z_sweep', '--config', 'config_z8_cpu_rl2.yaml', '--checkpoint', 'joint_calibrated', '--num-z', '129', '--batch', '128']
import runpy; runpy.run_path('/root/repo/benchmarks/z_sweep.py', run_name='__main__')
" > z_sweep_cpu_d8_joint.log 2>&1
echo "sweep done; chamfer-only RL starting $(date -u)" >> z8_followup.status

timeout 10800 python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['train', '--config', 'config_z8_cpu_chr.yaml', '--phase', 'rl_agent', '--resume', 'lgan_final']
import runpy; runpy.run_path('/root/repo/train_rl_gan_net.py', run_name='__main__')
" > rl_chr.log 2>&1
echo "chr RL done; chr sweep starting $(date -u)" >> z8_followup.status

timeout 3600 python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['z_sweep', '--config', 'config_z8_cpu_chr.yaml', '--checkpoint', 'rl_agent_final', '--num-z', '129', '--batch', '128']
import runpy; runpy.run_path('/root/repo/benchmarks/z_sweep.py', run_name='__main__')
" > z_sweep_cpu_d8_chr.log 2>&1
echo "chain complete $(date -u)" >> z8_followup.status
