"""tools/bench_trained_serving.py end-to-end on CPU: npz checkpoint ->
length-sorted loader -> early-exit decode -> metric sums -> JSON line.

This is the measurement tool for the persistent-vs-XLA serving comparison
(VERDICT r3 item 2); the test pins its CLI contract so a TPU measurement
session never burns a device window on tool bugs."""
import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.tiny import tiny_config, write_tiny_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    write_tiny_dataset(str(root))

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        ROOT=str(root / "infos"),
        DATASETS_TRAIN=str(root / "train.txt"),
        DATASETS_VALID=str(root / "valid.txt"),
        DATASETS_TEST=str(root / "test.txt"),
        BATCH_SIZE=4,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=320,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.0),
    )

    import jax

    from plankassembly_tpu.models.model import ModelDims, init_params
    from tools.export_checkpoint import _flatten

    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    ckpt = root / "tiny.npz"
    np.savez(ckpt, **flat)
    with open(root / "tiny.hparams.yaml", "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)
    return root, ckpt


def test_serving_bench_cli(setup):
    root, ckpt = setup
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/bench_trained_serving.py"),
         "--cpu", "--ckpt", str(ckpt), "--impls", "mxu",
         "--batch", "4", "--bucket", "320"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["impl"] == "mxu"
    assert rec["samples"] == 4            # all rows counted once
    assert rec["programs_per_sec_serving"] > 0
    assert 1 <= rec["mean_steps"] <= 48   # early exit reported
    assert 0.0 <= rec["fmeasure"] <= 1.0
