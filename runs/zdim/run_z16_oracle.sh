#!/bin/bash
# z16 oracle data point (LGAN-only, no RL): does the per-sample oracle keep
# improving past d=8, or has the GAN path saturated? Extends the z_dim curve
# in RESULTS.md section 4 — evidence for choosing the flagship default.
# Waits for the running pytest to exit to avoid three-way core contention.
cd "$(dirname "$0")"
while pgrep -x pytest >/dev/null 2>&1 || ps aux | grep "[p]ytest tests" >/dev/null; do sleep 60; done
nice -n 19 timeout 14400 python -u -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['train', '--config', 'config_z16_cpu.yaml', '--phase', 'lgan', '--resume', 'seed_ae']
import runpy; runpy.run_path('/root/repo/train_rl_gan_net.py', run_name='__main__')
" > lgan_cpu_z16.log 2>&1
echo "z16 lgan done rc=$? $(date -u)" >> z16.status
nice -n 19 timeout 14400 python -u -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['z_sweep', '--config', 'config_z16_cpu.yaml', '--checkpoint', 'lgan_final', '--num-z', '129', '--batch', '128']
import runpy; runpy.run_path('/root/repo/benchmarks/z_sweep.py', run_name='__main__')
" > z_sweep_cpu_d16.log 2>&1
echo "z16 sweep129 done rc=$? $(date -u)" >> z16.status
nice -n 19 timeout 14400 python -u -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['z_sweep', '--config', 'config_z16_cpu.yaml', '--checkpoint', 'lgan_final', '--num-z', '257', '--batch', '128']
import runpy; runpy.run_path('/root/repo/benchmarks/z_sweep.py', run_name='__main__')
" > z_sweep_cpu_d16_257.log 2>&1
echo "z16 sweep257 done rc=$? $(date -u)" >> z16.status
