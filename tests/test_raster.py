"""Raster/ViT modality: rasterizer, patchify, loss, decode."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.data.raster import rasterize_lines, rasterize_views
from plankassembly_tpu.models.model import ModelDims
from plankassembly_tpu.models.vit import (
    VitDims, greedy_decode_raster, init_vit_params, patchify,
    train_step_loss_raster,
)
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)
VIT = VitDims(image_size=64, patch_size=16)  # 16 patches/view, 48 tokens


def test_rasterize_draws_lines():
    img = rasterize_lines([np.array([[-1, 0], [1, 0]])], [0], image_size=64)
    assert img.shape == (64, 64)
    row = img[32]  # y=0 maps to the middle row
    assert (row > 0).sum() >= 60  # nearly the whole row lit
    assert img.max() == 1.0
    # hidden line at half intensity
    img2 = rasterize_lines([np.array([[-1, 0.5], [1, 0.5]])], [1], 64)
    assert img2.max() == 0.5


def test_rasterize_views_channels():
    lines = [np.array([[-0.5, -0.5], [0.5, -0.5]]),
             np.array([[0, -1], [0, 1]])]
    img = rasterize_views(lines, [0, 2], [0, 0], image_size=64)
    assert img.shape == (3, 64, 64)
    assert img[0].sum() > 0 and img[2].sum() > 0 and img[1].sum() == 0


def test_patchify_shape_and_content():
    imgs = jnp.arange(2 * 3 * 64 * 64, dtype=jnp.float32).reshape(2, 3, 64, 64)
    p = patchify(imgs, 16)
    assert p.shape == (2, 3 * 16, 256)
    # first patch of first view = top-left 16x16 block
    np.testing.assert_array_equal(
        np.asarray(p[0, 0]).reshape(16, 16), np.asarray(imgs[0, 0, :16, :16]))


@pytest.fixture(scope="module")
def setup():
    params = init_vit_params(jax.random.PRNGKey(0), DIMS, VIT)
    batch_np = random_batch(CFG, batch_size=2, seed=2)
    rng = np.random.default_rng(0)
    batch = {
        "input_image": jnp.asarray(
            rng.random((2, 3, VIT.image_size, VIT.image_size)), jnp.float32),
        "output_value": jnp.asarray(batch_np["output_value"]),
        "output_label": jnp.asarray(batch_np["output_label"]),
        "output_mask": jnp.asarray(batch_np["output_mask"]),
    }
    return params, batch


def test_raster_loss_and_grads(setup):
    params, batch = setup
    loss, mets = train_step_loss_raster(params, batch, DIMS, VIT,
                                        deterministic=True,
                                        compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: train_step_loss_raster(
        p, batch, DIMS, VIT, deterministic=True,
        compute_dtype=jnp.float32)[0])(params)
    assert float(jnp.linalg.norm(g["embed"]["patch"])) > 0


def test_raster_decode(setup):
    params, batch = setup
    out = greedy_decode_raster(params, {"input_image": batch["input_image"]},
                               DIMS, VIT, compute_dtype=jnp.float32)
    assert out["samples"].shape == (2, DIMS.max_output_length)


def test_raster_trainer_e2e(tmp_path):
    """Full raster pipeline: info JSONs -> RasterDataset -> fit -> test."""
    import json
    import os
    from plankassembly_tpu.data import geometry as geo
    from plankassembly_tpu.factory.projection import (
        VIEWS, postprocess_complete, project_boxes)
    from plankassembly_tpu.factory.synthetic import generate_cabinet
    from plankassembly_tpu.train.raster_loop import RasterTrainer

    os.makedirs(tmp_path / "infos")
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
        name = f"r{seed}"
        info = {"name": name, "views": views, "types": types_all,
                "svgs": svgs,
                "lines": [geo.bounds(geo.from_geojson(s)).tolist()
                          for s in svgs],
                "coords": np.round(planks / 1280.0, 3).tolist(),
                "attach": attach.tolist()}
        with open(tmp_path / "infos" / f"{name}.json", "w") as f:
            json.dump(info, f)
        names.append(name)
    with open(tmp_path / "split.txt", "w") as f:
        f.write("".join(f"{n}.json\n" for n in names))

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, ROOT=str(tmp_path / "infos"),
        DATASETS_TRAIN=str(tmp_path / "split.txt"),
        DATASETS_VALID=str(tmp_path / "split.txt"),
        DATASETS_TEST=str(tmp_path / "split.txt"),
        BATCH_SIZE=2,
        DATA=dataclasses.replace(cfg.DATA, MAX_OUTPUT_LENGTH=48,
                                 AUG_RATIO=0.0),
        trainer=dataclasses.replace(cfg.trainer, devices=1, max_epochs=1,
                                    check_val_every_n_epoch=1,
                                    default_root_dir=str(tmp_path / "logs")))
    trainer = RasterTrainer(cfg, compute_dtype=jnp.float32,
                            image_size=64, patch_size=16)
    state = trainer.fit(max_epochs=1)
    assert int(state.step) == 1
    trainer.test(state)
    preds = os.listdir(os.path.join(trainer.log_dir, "pred_jsons"))
    assert len(preds) == 2
