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


def test_raster_beam_decode_beam1_matches_greedy(setup):
    from plankassembly_tpu.models.vit import beam_decode_raster

    params, batch = setup
    raster_in = {"input_image": batch["input_image"]}
    g = greedy_decode_raster(params, raster_in, DIMS, VIT,
                             compute_dtype=jnp.float32)
    b = beam_decode_raster(params, raster_in, DIMS, VIT, num_beams=1,
                           compute_dtype=jnp.float32)
    gs, bs = np.asarray(g["samples"]), np.asarray(b["samples"])
    for i in range(gs.shape[0]):
        hits = np.nonzero(gs[i] == DIMS.end)[0]
        n = hits[0] + 1 if hits.size else gs.shape[1]
        np.testing.assert_array_equal(gs[i, :n], bs[i, :n])


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
        # raster inputs don't consume the token budget, but the packed-
        # segment budget is MAX_INPUT_LENGTH // 4 — give it headroom
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=256,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.0),
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


def test_device_rasterizer_matches_host_exactly():
    """`rasterize_device` (MXU outer-product formulation) must reproduce the
    host splatter pixel-for-pixel on axis-aligned segments — including
    out-of-extent clipping and the 0.5 hidden / 1.0 visible max rule."""
    from plankassembly_tpu.data.raster import rasterize_device

    rng = np.random.default_rng(3)
    B, N, S = 2, 24, 64
    lines = np.zeros((B, N, 4), np.float32)
    views = rng.integers(0, 3, (B, N)).astype(np.int32)
    intens = rng.choice([0.0, 0.5, 1.0], (B, N)).astype(np.float32)
    for b in range(B):
        for n in range(N):
            x0, y0 = rng.uniform(-1.15, 1.15, 2)
            if rng.random() < 0.5:
                lines[b, n] = [x0, y0, rng.uniform(-1.15, 1.15), y0]
            else:
                lines[b, n] = [x0, y0, x0, rng.uniform(-1.15, 1.15)]

    dev = np.asarray(rasterize_device(jnp.asarray(lines), jnp.asarray(views),
                                      jnp.asarray(intens), S))
    assert dev.shape == (B, 3, S, S)
    for b in range(B):
        keep = intens[b] > 0
        ref = rasterize_views([lines[b, n].reshape(2, 2)
                               for n in range(N) if keep[n]],
                              views[b, keep],
                              [0 if intens[b, n] == 1.0 else 1
                               for n in range(N) if keep[n]],
                              image_size=S)
        np.testing.assert_array_equal(dev[b], ref)


def test_pack_lines_roundtrip_device_raster():
    """RasterDataset device mode: packed segments -> device image equals the
    host-mode image for the same sample."""
    from plankassembly_tpu.data.raster import (
        pack_lines, rasterize_device, rasterize_views,
    )

    ls = [np.array([[-0.5, -0.5], [0.5, -0.5]]),
          np.array([[0.25, -1.0], [0.25, 1.0]])]
    views, types = [0, 2], [0, 1]
    packed = pack_lines(ls, views, types, max_lines=8)
    assert packed["input_lines"].shape == (8, 4)
    dev = np.asarray(rasterize_device(
        jnp.asarray(packed["input_lines"][None]),
        jnp.asarray(packed["input_line_view"][None]),
        jnp.asarray(packed["input_line_inten"][None]), 64))[0]
    ref = rasterize_views(ls, views, types, image_size=64)
    np.testing.assert_array_equal(dev, ref)


def test_raster_loss_grads_through_device_rasterizer(setup):
    """The train loss accepts packed-segment batches; gradients flow to the
    patch embedding (the rasterized image itself is non-differentiable input,
    like pixels from disk)."""
    params, batch = setup
    rng = np.random.default_rng(5)
    lines = np.zeros((2, 8, 4), np.float32)
    for b in range(2):
        for n in range(8):
            x0, y0 = rng.uniform(-1, 1, 2)
            lines[b, n] = [x0, y0, rng.uniform(-1, 1), y0]
    seg_batch = {
        "input_lines": jnp.asarray(lines),
        "input_line_view": jnp.asarray(rng.integers(0, 3, (2, 8)), jnp.int32),
        "input_line_inten": jnp.ones((2, 8), jnp.float32),
        "output_value": batch["output_value"],
        "output_label": batch["output_label"],
        "output_mask": batch["output_mask"],
    }
    loss, _ = train_step_loss_raster(params, seg_batch, DIMS, VIT,
                                     deterministic=True,
                                     compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: train_step_loss_raster(
        p, seg_batch, DIMS, VIT, deterministic=True,
        compute_dtype=jnp.float32)[0])(params)
    assert float(jnp.linalg.norm(g["embed"]["patch"])) > 0
