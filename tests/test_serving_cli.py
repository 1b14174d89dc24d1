"""tools/export_serving.py + tools/serve.py end-to-end on CPU.

Pins the deployment CLIs' contract: a released .npz checkpoint exports to
a PSRV1 artifact that --verify round-trips bit-exactly, and tools/serve.py
serves that artifact over HTTP — reconstruction JSON out, health/meta
endpoints live, conflicting flags rejected.

Dims match tests/test_predict_cli.py so the persistent compile cache is
shared (single-core container; see tests/tiny.py).
"""
import dataclasses
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest
import yaml

from tests.tiny import tiny_config, write_tiny_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving_cli")
    names = write_tiny_dataset(str(root))

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
    hparams = root / "tiny.hparams.yaml"
    with open(hparams, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)

    artifact = root / "tiny.psrv"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/export_serving.py"),
         "--cpu", "--ckpt", str(ckpt), "--out", str(artifact),
         "--batch", "2", "--bucket", "319", "--dtype", "float32",
         "--platforms", "cpu", "--verify"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]
    assert "verify: artifact tokens bit-exact" in r.stdout
    return root, ckpt, hparams, artifact, names


def test_export_cli_writes_valid_artifact(setup):
    root, ckpt, hparams, artifact, names = setup
    from plankassembly_tpu.export import load_artifact
    prog = load_artifact(str(artifact))
    assert prog.meta["batch"] == 2 and prog.meta["bucket"] == 319


def test_serve_cli_over_http(setup):
    root, ckpt, hparams, artifact, names = setup
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools/serve.py"),
         "--cpu", "--artifact", str(artifact), "--hparams", str(hparams),
         "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env={**os.environ, "PYTHONPATH": REPO})
    try:
        line = proc.stdout.readline()  # blocks until the startup banner
        assert "serving on http://127.0.0.1:" in line, line
        port = int(line.split("http://127.0.0.1:")[1].split()[0])
        base = f"http://127.0.0.1:{port}"

        with open(os.path.join(str(root), "infos",
                               f"{names[0]}.json")) as f:
            info = json.load(f)
        req = urllib.request.Request(
            base + "/v1/reconstruct", data=json.dumps(info).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.loads(r.read().decode())
        assert out["name"] == names[0]
        assert len(out["attach"]) == len(out["prediction"])
        with urllib.request.urlopen(base + "/meta", timeout=30) as r:
            meta = json.loads(r.read().decode())
        assert meta["bucket"] == 319
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_predict_from_artifact(setup, tmp_path):
    """tools/predict.py --artifact: offline batch prediction straight from
    the PSRV1 file, matching the checkpoint path's outputs (same decode
    semantics: kv_quant int8, mxu impl, f32 here)."""
    root, ckpt, hparams, artifact, names = setup
    out_a = tmp_path / "from_artifact"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/predict.py"),
         "--cpu", "--artifact", str(artifact), "--hparams", str(hparams),
         "--out", str(out_a), "--info_dir", os.path.join(str(root),
                                                         "infos")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]
    assert f"predicted {len(names)} samples" in r.stdout
    for n in names:
        with open(out_a / f"{n}.json") as f:
            rec = json.load(f)
        assert set(rec) == {"prediction", "attach"}


def test_export_cli_bucket_ladder(setup, tmp_path):
    """--bucket 159,319 writes one artifact per rung with .k<b> names."""
    root, ckpt, hparams, artifact, names = setup
    out = tmp_path / "ladder.psrv"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/export_serving.py"),
         "--cpu", "--ckpt", str(ckpt), "--out", str(out),
         "--batch", "2", "--bucket", "159,319", "--dtype", "float32",
         "--platforms", "cpu"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]
    from plankassembly_tpu.export import load_artifact
    for b in (159, 319):
        prog = load_artifact(str(tmp_path / f"ladder.k{b}.psrv"))
        assert prog.meta["bucket"] == b


def test_serve_cli_rejects_conflicting_flags(setup):
    root, ckpt, hparams, artifact, names = setup
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/serve.py"),
         "--cpu", "--artifact", str(artifact), "--hparams", str(hparams),
         "--beam", "4"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode != 0
    assert "compiled into an --artifact" in r.stderr
