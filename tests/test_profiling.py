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


def test_tensorboard_logging(tmp_path):
    """logging.use_tensorboard writes tfevents with the reference's tags."""
    from gan_rl_3d_tpu.utils.metrics_logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), use_tensorboard=True)
    logger.log_scalar("AE/Train_Loss", 0.5, 1)
    logger.close()
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events, "no tfevents written"
    assert (tmp_path / "metrics.jsonl").read_text().count("AE/Train_Loss")
