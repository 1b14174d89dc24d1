"""Visible-lines modality end-to-end: visible-only factory render -> fit ->
test -> offline evaluate, asserting the reference's no-augmentation quirk.

The reference's `trainer_visible.py:17-18` passes `cfg=` positionally such
that `augmentation` stays False — the published visible checkpoint was
trained WITHOUT noise augmentation, and `VisibleTrainer` preserves that
(DEVIATIONS.md). This is the dedicated visible e2e VERDICT r2 asked for.
"""
import dataclasses
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.data import geometry as geo
from plankassembly_tpu.factory.projection import (
    VIEWS, postprocess_visible, project_boxes,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet
from plankassembly_tpu.io.svg import parse_svg, render_svg
from plankassembly_tpu.train import VisibleTrainer
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Tiny on-disk visible-lines dataset: hidden lines filtered + chains
    merged by the factory's `postprocess_visible` (reference
    `dataset/render_visible_svg.py`)."""
    root = tmp_path_factory.mktemp("visible_data")
    os.makedirs(root / "infos")
    names = []
    for seed in range(4):
        planks, attach = generate_cabinet(seed, max_planks=5)
        boxes = planks[1:] / 1280.0
        svgs, views, types_all = [], [], []
        for v_i, view in enumerate(VIEWS):
            lines, types = project_boxes(boxes, view)
            lines, types = postprocess_visible(lines, types)
            # visible renders carry no hidden lines at all
            assert all(t == 0 for t in types)
            path = str(root / f"tmp_{view}.svg")
            render_svg(path, lines, types)
            plines, ptypes = parse_svg(path)
            svgs.extend(geo.to_geojson(l) for l in plines)
            types_all.extend(ptypes)
            views.extend([v_i] * len(plines))
        name = f"vis{seed:03d}"
        info = {
            "name": name,
            "lines": [geo.bounds(geo.from_geojson(s)).tolist() for s in svgs],
            "views": views, "types": types_all, "svgs": svgs,
            "coords": np.round(planks / 1280.0, 3).tolist(),
            "attach": attach.tolist(),
        }
        with open(root / "infos" / f"{name}.json", "w") as f:
            json.dump(info, f)
        names.append(name)
    for split in ("train", "valid", "test"):
        with open(root / f"{split}.txt", "w") as f:
            f.write("".join(f"{n}.json\n" for n in names))
    return root


def test_visible_fit_test_evaluate(dataset_dir, tmp_path):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        ROOT=str(dataset_dir / "infos"),
        DATASETS_TRAIN=str(dataset_dir / "train.txt"),
        DATASETS_VALID=str(dataset_dir / "valid.txt"),
        DATASETS_TEST=str(dataset_dir / "test.txt"),
        BATCH_SIZE=4,
        # AUG_RATIO deliberately nonzero: the quirk under test is that
        # VisibleTrainer ignores it for training
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=320,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.5),
        trainer=dataclasses.replace(
            cfg.trainer, devices=1, max_epochs=1, check_val_every_n_epoch=1,
            log_every_n_steps=1, default_root_dir=str(tmp_path / "logs")),
    )
    trainer = VisibleTrainer(cfg, compute_dtype=jnp.float32)

    # the no-aug quirk (`trainer_visible.py:17-18`): training dataset has
    # augmentation disabled even though cfg.DATA.AUG_RATIO > 0 ...
    assert trainer.train_augmentation is False
    assert trainer.train_dataloader().dataset.augmentation is False
    # ... while the complete-lines trainer with the same config would not
    from plankassembly_tpu.train import Trainer
    assert Trainer.train_augmentation is True

    state = trainer.fit(max_epochs=1)
    assert int(state.step) == 1  # 4 samples / batch 4

    trainer.test(state)
    pred_dir = os.path.join(trainer.log_dir, "pred_jsons")
    files = sorted(os.listdir(pred_dir))
    assert len(files) == 4
    with open(os.path.join(pred_dir, files[0])) as f:
        payload = json.load(f)
    # visible JSONs use the complete-lines writer: attach key present
    for key in ("prediction", "attach", "groundtruth", "precision",
                "recall", "fmeasure"):
        assert key in payload

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
