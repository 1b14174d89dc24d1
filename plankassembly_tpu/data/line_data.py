"""Line-input dataset (complete and visible modalities).

Loads the per-sample info JSONs produced by the data factory (the on-disk
contract defined by `dataset/prepare_info.py:59-70` in the reference) and
packs them into static-shape token batches.

Behavioral match of `plankassembly/datasets/line_data.py`.
"""
from __future__ import annotations

import json
import os

import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.data import geometry as geo
from plankassembly_tpu.data.noise import add_noise
from plankassembly_tpu.data.packing import pack_input_sequence, pack_output_sequence


class LineDataset:
    """Map-style dataset: index -> dict of numpy arrays + 'name'."""

    def __init__(self, root: str, info_files: list[str], cfg: Config,
                 augmentation: bool = False, rng=None):
        self.root = root
        self.info_files = info_files
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = rng or np.random

    def __len__(self) -> int:
        return len(self.info_files)

    def __getitem__(self, index: int) -> dict:
        with open(os.path.join(self.root, self.info_files[index])) as f:
            info = json.loads(f.read())

        name = info["name"]
        linestrings = [geo.from_geojson(svg) for svg in info["svgs"]]

        lines = np.array(info["lines"], dtype=np.float64)
        views = np.array(info["views"], dtype=np.int64)
        types = np.array(info["types"], dtype=np.int64)

        planks = np.array(info["coords"]).flatten()
        attach = np.array(info["attach"]).flatten()

        if self.augmentation and self.rng.random() < self.cfg.DATA.AUG_RATIO:
            linestrings, views, types = add_noise(
                linestrings, views, types,
                self.cfg.DATA.NOISE_RATIO, self.cfg.DATA.NOISE_LENGTH,
                rng=self.rng)
            lines = geo.bounds_many(linestrings)

        inputs = pack_input_sequence(
            lines, views, types, self.cfg.DATA, self.cfg.TOKEN, with_type=True)
        outputs = pack_output_sequence(planks, attach, self.cfg.DATA, self.cfg.TOKEN)

        return {"name": name, **inputs, **outputs}
