"""Shared tiny model configuration for fast CPU tests.

Shapes are deliberately identical across tests so XLA's persistent
compilation cache is reused (this container has a single CPU core).
"""
import dataclasses

import numpy as np

from plankassembly_tpu.config import Config


def tiny_config() -> Config:
    cfg = Config()
    return dataclasses.replace(
        cfg,
        BATCH_SIZE=2,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=32, MAX_OUTPUT_LENGTH=24),
        MODEL=dataclasses.replace(
            cfg.MODEL, NUM_MODEL=16, NUM_HEAD=2, NUM_FEEDFORWARD=32,
            NUM_ENCODER_LAYERS=1, NUM_DECODER_LAYERS=1),
    )


def random_batch(cfg: Config, batch_size=2, seed=0, with_type=True):
    """A structurally plausible random token batch (not geometry-derived)."""
    rng = np.random.default_rng(seed)
    li = cfg.DATA.MAX_INPUT_LENGTH - 1
    s = cfg.DATA.MAX_OUTPUT_LENGTH
    n_in = li - 4  # leave room for END + pads
    n_out = 18  # 3 planks

    batch = {}
    iv = rng.integers(0, 512, (batch_size, li))
    iv[:, n_in] = cfg.TOKEN.END
    iv[:, n_in + 1:] = cfg.TOKEN.PAD
    batch["input_value"] = iv
    batch["input_pos"] = rng.integers(0, cfg.DATA.max_num_input, (batch_size, li))
    batch["input_coord"] = np.tile(np.arange(li) % 4, (batch_size, 1))
    batch["input_view"] = rng.integers(0, 3, (batch_size, li))
    if with_type:
        batch["input_type"] = rng.integers(0, 2, (batch_size, li))
    batch["input_mask"] = iv == cfg.TOKEN.PAD

    ov = rng.integers(0, 512, (batch_size, s))
    ov[:, n_out] = cfg.TOKEN.END
    ov[:, n_out + 1:] = cfg.TOKEN.PAD
    batch["output_value"] = ov
    label = ov.copy()
    # sprinkle some legal pointer labels: token i >= 6 points to (i%6+3)%6
    for b in range(batch_size):
        for i in (7, 13):
            j = (i % 6 + 3) % 6
            label[b, i] = cfg.DATA.VOCAB_SIZE + j
    batch["output_label"] = label
    batch["output_mask"] = ov == cfg.TOKEN.PAD
    return batch


def write_tiny_dataset(root, n_samples=4):
    """Tiny on-disk dataset (full factory path): info JSONs + split files.

    Shared by the e2e trainer test and the serving-bench test so both
    reuse the same compiled shapes."""
    import json
    import os

    from plankassembly_tpu.data import geometry as geo
    from plankassembly_tpu.factory.projection import (
        VIEWS, postprocess_complete, project_boxes,
    )
    from plankassembly_tpu.factory.synthetic import generate_cabinet
    from plankassembly_tpu.io.svg import parse_svg, render_svg

    os.makedirs(os.path.join(root, "infos"), exist_ok=True)
    names = []
    for seed in range(n_samples):
        planks, attach = generate_cabinet(seed, max_planks=5)
        boxes = planks[1:] / 1280.0
        svgs, views, types_all = [], [], []
        for v_i, view in enumerate(VIEWS):
            lines, types = project_boxes(boxes, view)
            lines, types = postprocess_complete(lines, types)
            path = os.path.join(root, f"tmp_{view}.svg")
            render_svg(path, lines, types)
            plines, ptypes = parse_svg(path)
            svgs.extend(geo.to_geojson(l) for l in plines)
            types_all.extend(ptypes)
            views.extend([v_i] * len(plines))
        name = f"syn{seed:03d}"
        info = {
            "name": name,
            "lines": [geo.bounds(geo.from_geojson(s)).tolist() for s in svgs],
            "views": views, "types": types_all, "svgs": svgs,
            "coords": np.round(planks / 1280.0, 3).tolist(),
            "attach": attach.tolist(),
        }
        with open(os.path.join(root, "infos", f"{name}.json"), "w") as f:
            json.dump(info, f)
        names.append(name)
    for split in ("train", "valid", "test"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("".join(f"{n}.json\n" for n in names))
    return names
