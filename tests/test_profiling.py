"""Profiling utility tests."""

import jax
import jax.numpy as jnp

from gan_rl_3d_tpu.utils import profiling


def test_step_timer():
    timer = profiling.StepTimer()
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    for _ in range(3):
        with timer.step():
            out = f(x)
            timer.observe(out)
    assert timer.last_s is not None and timer.last_s > 0
    assert timer.ema_s is not None and timer.ema_s > 0


def test_trace_context(tmp_path):
    with profiling.trace(str(tmp_path / "prof")):
        _ = jax.jit(lambda a: a * 2)(jnp.ones((32,))).block_until_ready()
    # trace directory was created with some content
    assert any((tmp_path / "prof").rglob("*"))


def test_trace_disabled(tmp_path):
    with profiling.trace(str(tmp_path / "off"), enabled=False):
        pass
    assert not (tmp_path / "off").exists()
