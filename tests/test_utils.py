"""utils: step timer + profiling hooks."""
import time

import jax.numpy as jnp

from plankassembly_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_warmup_and_ema():
    timer = StepTimer(warmup=1, ema=0.5)
    x = jnp.ones(())
    assert timer.tick(x) is None  # warmup
    time.sleep(0.01)
    timer.tick(x)
    time.sleep(0.01)
    avg = timer.tick(x)
    assert avg is not None and avg > 0
    assert timer.steps_per_sec and timer.steps_per_sec > 0


def test_annotate_context():
    with annotate("test-region"):
        pass  # must not raise
