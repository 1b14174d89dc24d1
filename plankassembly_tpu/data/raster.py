"""Raster-image inputs: rasterize three-view line drawings + dataset.

The raster/ViT variant (CAD2Program-style) consumes rendered images of the
three orthographic views instead of vector line tokens. This module draws
the info-JSON linestrings into a (3, S, S) float image — one channel per
view — with hidden lines at half intensity (the raster analogue of the
`input_type` stream), using a supersampled numpy rasterizer (no external
imaging deps in this environment).
"""
from __future__ import annotations

import json
import os

import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.data import geometry as geo
from plankassembly_tpu.data.noise import add_noise
from plankassembly_tpu.data.packing import pack_output_sequence


def rasterize_lines(lines, types, image_size: int = 256,
                    world_extent: float = 1.0, supersample: int = 2) -> np.ndarray:
    """Draw polylines (world coords in [-extent, extent]) into (S, S) floats.

    Visible lines (type 0) draw at 1.0, hidden (type 1) at 0.5; overlaps
    take the max. Supersampled splatting keeps thin geometry visible at any
    angle without an AA kernel.
    """
    from plankassembly_tpu.factory import native
    if native.available():
        intensities = [1.0 if t == 0 else 0.5 for t in types]
        out = native.rasterize(list(lines), intensities, image_size,
                               supersample, world_extent)
        if out is not None:
            return out

    ss = image_size * supersample
    img = np.zeros((ss, ss), dtype=np.float32)
    scale = ss / (2.0 * world_extent)

    for line, line_type in zip(lines, types):
        line = np.asarray(line, dtype=np.float64)
        intensity = 1.0 if line_type == 0 else 0.5
        for k in range(len(line) - 1):
            p, q = line[k], line[k + 1]
            length = np.hypot(*(q - p))
            n = max(2, int(np.ceil(length * scale * 2)))
            ts = np.linspace(0.0, 1.0, n)
            pts = p[None, :] + ts[:, None] * (q - p)[None, :]
            xi = np.clip(((pts[:, 0] + world_extent) * scale).astype(int),
                         0, ss - 1)
            yi = np.clip(((pts[:, 1] + world_extent) * scale).astype(int),
                         0, ss - 1)
            np.maximum.at(img, (yi, xi), intensity)

    if supersample > 1:
        img = img.reshape(image_size, supersample,
                          image_size, supersample).max(axis=(1, 3))
    return img


def rasterize_views(linestrings, views, types, image_size: int = 256) -> np.ndarray:
    """(3, S, S): one channel per orthographic view."""
    out = np.zeros((3, image_size, image_size), dtype=np.float32)
    for v in range(3):
        vl = [l for l, vi in zip(linestrings, views) if vi == v]
        vt = [t for t, vi in zip(types, views) if vi == v]
        if vl:
            out[v] = rasterize_lines(vl, vt, image_size)
    return out


class RasterDataset:
    """Map-style dataset for the raster/ViT modality: images in, the same
    shape-program token targets out."""

    def __init__(self, root: str, info_files: list[str], cfg: Config,
                 augmentation: bool = False, rng=None,
                 image_size: int = 256):
        self.root = root
        self.info_files = info_files
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = rng or np.random
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.info_files)

    def __getitem__(self, index: int) -> dict:
        with open(os.path.join(self.root, self.info_files[index])) as f:
            info = json.loads(f.read())

        name = info["name"]
        linestrings = [geo.from_geojson(svg) for svg in info["svgs"]]
        views = np.array(info["views"], dtype=np.int64)
        types = np.array(info["types"], dtype=np.int64)

        planks = np.array(info["coords"]).flatten()
        attach = np.array(info["attach"]).flatten()

        if self.augmentation and self.rng.random() < self.cfg.DATA.AUG_RATIO:
            linestrings, views, types = add_noise(
                linestrings, views, types,
                self.cfg.DATA.NOISE_RATIO, self.cfg.DATA.NOISE_LENGTH,
                rng=self.rng)

        image = rasterize_views(linestrings, views, types, self.image_size)
        outputs = pack_output_sequence(planks, attach, self.cfg.DATA,
                                       self.cfg.TOKEN)
        return {"name": name, "input_image": image, **outputs}
