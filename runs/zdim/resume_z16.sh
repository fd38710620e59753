#!/bin/bash
# Resume the z16 oracle study: the LGAN finished (lgan_cpu_z16.log, rc=0);
# the two z-sweeps were cut off by the round-4 session snapshot. CPU-only
# (forced in-process), nice'd so it never contends with TPU-side work.
cd "$(dirname "$0")"
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
echo "Z16 CHAIN COMPLETE $(date -u)" >> z16.status
