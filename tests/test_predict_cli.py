"""tools/predict.py end-to-end on CPU: npz checkpoint + info JSONs ->
length-sorted batched decode -> per-name prediction JSONs.

Pins the serving CLI's contract (the reference's inference surface is the
Lightning `test` loop; `tools/predict.py` is this repo's standalone
equivalent): output files are named per sample regardless of the internal
length-sorted serve order, repeated --info flags accumulate, and the
--beam path emits the same schema as greedy.
"""
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
    root = tmp_path_factory.mktemp("predict")
    names = write_tiny_dataset(str(root))

    cfg = tiny_config()
    # identical dims to test_serving_bench so the compile cache is shared
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
    return root, ckpt, names


def _run_predict(out_dir, ckpt, extra):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/predict.py"),
         "--cpu", "--ckpt", str(ckpt), "--out", str(out_dir)] + extra,
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]
    return r


def _check_pred_files(out_dir, names):
    for name in names:
        path = os.path.join(str(out_dir), f"{name}.json")
        assert os.path.exists(path), f"missing prediction for {name}"
        with open(path) as f:
            rec = json.load(f)
        assert set(rec) == {"prediction", "attach"}
        pred = np.asarray(rec["prediction"])
        if pred.size:
            assert pred.ndim == 2 and pred.shape[1] == 6
        assert len(rec["attach"]) == len(rec["prediction"])


def test_predict_greedy_batched(setup, tmp_path):
    """Repeated --info flags accumulate; --batch < n exercises the
    length-sorted chunking; every input gets its per-name output file."""
    root, ckpt, names = setup
    infos = [str(root / "infos" / f"{n}.json") for n in names]
    out = tmp_path / "greedy"
    r = _run_predict(out, ckpt,
                     ["--batch", "2",
                      "--info", infos[0], infos[1],
                      "--info", infos[2], infos[3]])
    assert f"predicted {len(names)} samples" in r.stdout
    _check_pred_files(out, names)


def test_predict_beam(setup, tmp_path):
    root, ckpt, names = setup
    out = tmp_path / "beam"
    _run_predict(out, ckpt,
                 ["--batch", "4", "--beam", "2",
                  "--info_dir", str(root / "infos")])
    _check_pred_files(out, names)
