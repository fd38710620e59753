#!/bin/bash
cd /root/repo/runs/zdim
exec python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
sys.argv = ['train', '--config', 'config_z8_cpu_rl2.yaml', '--phase', 'joint', '--resume', 'rl_agent_final']
import runpy; runpy.run_path('/root/repo/train_rl_gan_net.py', run_name='__main__')
" > joint_cpu.log 2>&1
