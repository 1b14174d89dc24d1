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
    """Map-style dataset: index -> dict of numpy arrays + 'name'.

    cache_dir: optional packed-sample cache (`data/cache.py`) — packs every
    sample once into memmaps, so steady-state reads skip the JSON parse and
    quantize/lexsort/pad work entirely. Augmented reads (probability
    AUG_RATIO when `augmentation`) always pack fresh from the JSON.
    """

    def __init__(self, root: str, info_files: list[str], cfg: Config,
                 augmentation: bool = False, rng=None,
                 cache_dir: str | None = None):
        self.root = root
        self.info_files = info_files
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = rng or np.random
        self._cache = None
        if cache_dir:
            from plankassembly_tpu.data import cache as _c
            key = [type(self).__name__,
                   cfg.DATA.MAX_INPUT_LENGTH, cfg.DATA.MAX_OUTPUT_LENGTH,
                   cfg.DATA.NUM_BITS, cfg.TOKEN.END, cfg.TOKEN.PAD]
            key += _c.split_fingerprint(root, info_files)
            self._cache = _c.build_or_open(
                cache_dir, key, len(info_files),
                lambda i: self._pack(i)[1], progress_every=5000)

    def __len__(self) -> int:
        return len(self.info_files)

    def _pack(self, index: int, augment: bool = False):
        with open(os.path.join(self.root, self.info_files[index])) as f:
            info = json.loads(f.read())

        name = info["name"]
        linestrings = [geo.from_geojson(svg) for svg in info["svgs"]]

        lines = np.array(info["lines"], dtype=np.float64)
        views = np.array(info["views"], dtype=np.int64)
        types = np.array(info["types"], dtype=np.int64)

        planks = np.array(info["coords"]).flatten()
        attach = np.array(info["attach"]).flatten()

        if augment:
            linestrings, views, types = add_noise(
                linestrings, views, types,
                self.cfg.DATA.NOISE_RATIO, self.cfg.DATA.NOISE_LENGTH,
                rng=self.rng)
            lines = geo.bounds_many(linestrings)

        inputs = pack_input_sequence(
            lines, views, types, self.cfg.DATA, self.cfg.TOKEN, with_type=True)
        outputs = pack_output_sequence(planks, attach, self.cfg.DATA, self.cfg.TOKEN)
        return name, {**inputs, **outputs}

    def __getitem__(self, index: int) -> dict:
        augment = (self.augmentation
                   and self.rng.random() < self.cfg.DATA.AUG_RATIO)
        if self._cache is not None and not augment:
            name = os.path.splitext(self.info_files[index])[0].split("/")[-1]
            return {"name": name, **self._cache.row(index)}
        name, arrays = self._pack(index, augment)
        return {"name": name, **arrays}
