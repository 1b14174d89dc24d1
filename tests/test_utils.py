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


def test_crc32c_known_vector():
    from plankassembly_tpu.utils.tb_writer import crc32c
    # RFC 3720 / standard Castagnoli test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_tb_writer_roundtrip(tmp_path):
    """Scalars written as tfevents records decode back (CRC-checked) with
    the reference metric names (`trainer_complete.py:69-70,87-89`)."""
    from plankassembly_tpu.utils.tb_writer import (
        TensorBoardWriter, read_tfevents,
    )

    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 3.25, step=10)
    w.add_scalar("train/accuracy", 0.5, step=10)
    w.add_scalar("val/fmeasure", 0.938, step=200)
    w.close()

    events = read_tfevents(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = {(e.get("step"), tag): val for e in events
               for tag, val in e.get("scalars", {}).items()}
    assert scalars[(10, "train/loss")] == 3.25
    assert scalars[(10, "train/accuracy")] == 0.5
    assert abs(scalars[(200, "val/fmeasure")] - 0.938) < 1e-6


def test_metrics_logger_writes_tfevents(tmp_path):
    """MetricsLogger mirrors numeric payloads into the tfevents stream."""
    import glob

    from plankassembly_tpu.train.loop import MetricsLogger
    from plankassembly_tpu.utils.tb_writer import read_tfevents

    logger = MetricsLogger(str(tmp_path))
    logger.log(5, {"epoch": 0, "train/loss": 1.5})
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_tfevents(files[0])
    scalars = {tag: val for e in events
               for tag, val in e.get("scalars", {}).items()}
    assert scalars == {"train/loss": 1.5}  # 'epoch' stays JSONL-only
