"""End-to-end: synthetic factory -> trainer.fit -> test -> evaluate.

Covers SURVEY.md §4(f): mini-dataset through render -> prepare -> train a
few steps -> test-dump -> offline evaluate, plus checkpoint save/restore.
"""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tests.tiny import tiny_config, write_tiny_dataset

import dataclasses


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Tiny on-disk dataset: 4 samples, full factory path."""
    root = tmp_path_factory.mktemp("data")
    write_tiny_dataset(str(root))
    return root


def make_cfg(root, log_root):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        ROOT=str(root / "infos"),
        DATASETS_TRAIN=str(root / "train.txt"),
        DATASETS_VALID=str(root / "valid.txt"),
        DATASETS_TEST=str(root / "test.txt"),
        BATCH_SIZE=4,
        LR=3e-3,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=320,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.0),
        trainer=dataclasses.replace(
            cfg.trainer, devices=1, max_epochs=2, check_val_every_n_epoch=2,
            log_every_n_steps=1, default_root_dir=str(log_root)),
    )


def test_fit_validate_test_checkpoint(dataset_dir, tmp_path):
    from plankassembly_tpu.train import Trainer

    cfg = make_cfg(dataset_dir, tmp_path / "logs")
    trainer = Trainer(cfg, compute_dtype=jnp.float32)

    state = trainer.fit(max_epochs=2)
    assert int(state.step) == 2  # 4 samples / batch 4 = 1 step/epoch

    # checkpoints written (best from val @epoch2 + last)
    ckpt_dir = os.path.join(trainer.log_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))

    # restore round-trips exactly
    restored = trainer.load_checkpoint(os.path.join(ckpt_dir, "last"))
    np.testing.assert_array_equal(
        np.asarray(restored.params["heads"]["vocab"]["w"]),
        np.asarray(state.params["heads"]["vocab"]["w"]))

    # test dump: bit-compatible pred JSONs
    trainer.test(state)
    pred_dir = os.path.join(trainer.log_dir, "pred_jsons")
    files = sorted(os.listdir(pred_dir))
    assert len(files) == 4
    with open(os.path.join(pred_dir, files[0])) as f:
        payload = json.load(f)
    for key in ("prediction", "attach", "groundtruth", "precision",
                "recall", "fmeasure"):
        assert key in payload
    if payload["prediction"]:
        assert len(payload["prediction"][0]) == 6

    # offline evaluator consumes the dump (reference evaluate.py contract)
    data_path = tmp_path / "evalroot"
    os.makedirs(data_path, exist_ok=True)
    os.symlink(dataset_dir / "infos", data_path / "infos")
    result = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "evaluate.py"),
         "--data_path", str(data_path), "--exp_path", trainer.log_dir],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert result.returncode == 0, result.stderr
    assert "f1" in result.stdout
    assert os.path.exists(os.path.join(trainer.log_dir, "metrics.json"))

    # serving CLI: single info JSON -> prediction JSON + mesh, no GT needed
    pred_out = tmp_path / "predict_out"
    result = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "predict.py"),
         "--cpu", "--ckpt", os.path.join(ckpt_dir, "best"),
         "--info", str(dataset_dir / "infos" / "syn000.json"),
         "--out", str(pred_out), "--mesh", "stl"],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    with open(pred_out / "syn000.json") as f:
        pred_payload = json.load(f)
    assert "prediction" in pred_payload and "attach" in pred_payload
    if len(pred_payload["prediction"]) > 1:
        assert os.path.exists(pred_out / "syn000.stl")
