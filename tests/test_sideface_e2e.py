"""Sideface modality end-to-end: extraction -> fit -> test (incl. the
empty-sideface degenerate contract, `trainer_sideface.py:59-65`)."""
import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.data import geometry as geo
from plankassembly_tpu.factory.projection import (
    VIEWS, postprocess_complete, project_boxes,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet
from plankassembly_tpu.train import SidefaceTrainer
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sideface_data")
    os.makedirs(root / "infos")
    names = []
    for seed in range(2):
        planks, attach = generate_cabinet(seed, max_planks=5)
        boxes = planks[1:] / 1280.0
        svgs, views, types_all = [], [], []
        for v_i, view in enumerate(VIEWS):
            lines, types = project_boxes(boxes, view)
            lines, types = postprocess_complete(lines, types)
            svgs.extend(geo.to_geojson(l) for l in lines)
            types_all.extend(types)
            views.extend([v_i] * len(lines))
        name = f"s{seed}"
        info = {"name": name, "views": views, "types": types_all,
                "svgs": svgs,
                "lines": [geo.bounds(geo.from_geojson(s)).tolist()
                          for s in svgs],
                "coords": np.round(planks / 1280.0, 3).tolist(),
                "attach": attach.tolist()}
        with open(root / "infos" / f"{name}.json", "w") as f:
            json.dump(info, f)
        names.append(name)

    # one degenerate sample: a single dangling line -> no sidefaces
    info = {"name": "empty", "views": [0], "types": [0],
            "svgs": [geo.to_geojson(np.array([[0.0, 0.0], [0.3, 0.0]]))],
            "lines": [[0.0, 0.0, 0.3, 0.0]],
            "coords": np.round(generate_cabinet(9, max_planks=5)[0] / 1280.0,
                               3).tolist(),
            "attach": generate_cabinet(9, max_planks=5)[1].tolist()}
    with open(root / "infos" / "empty.json", "w") as f:
        json.dump(info, f)
    names.append("empty")

    with open(root / "split.txt", "w") as f:
        f.write("".join(f"{n}.json\n" for n in names))
    return root


def test_sideface_fit_and_degenerate_test(dataset_dir, tmp_path):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, ROOT=str(dataset_dir / "infos"),
        DATASETS_TRAIN=str(dataset_dir / "split.txt"),
        DATASETS_VALID=str(dataset_dir / "split.txt"),
        DATASETS_TEST=str(dataset_dir / "split.txt"),
        BATCH_SIZE=3,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=304,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.0),
        trainer=dataclasses.replace(cfg.trainer, devices=1, max_epochs=1,
                                    check_val_every_n_epoch=1,
                                    default_root_dir=str(tmp_path / "logs")))
    trainer = SidefaceTrainer(cfg, compute_dtype=jnp.float32)
    state = trainer.fit(max_epochs=1)
    trainer.test(state)

    pred_dir = os.path.join(trainer.log_dir, "pred_jsons")
    files = sorted(os.listdir(pred_dir))
    assert len(files) == 3

    with open(os.path.join(pred_dir, "empty.json")) as f:
        empty = json.load(f)
    # degenerate contract: empty prediction, zero scores, no attach key
    assert empty["prediction"] == []
    assert empty["precision"] == 0.0 and empty["fmeasure"] == 0.0
    assert "attach" not in empty

    with open(os.path.join(pred_dir, "s0.json")) as f:
        normal = json.load(f)
    assert "attach" not in normal  # sideface JSONs never carry attach
    assert "groundtruth" in normal
