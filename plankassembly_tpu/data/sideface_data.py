"""Sideface-input dataset: extracts thin-rectangle "side faces" from the
three-view line drawings and feeds their bounds as input tokens.

Behavioral match of `plankassembly/datasets/sideface_data.py`, rebuilt on the
numpy geometry core (no GEOS): polygonization of the axis-aligned line
arrangement via `geometry.polygonize_bounds`, thin-face detection
(`sideface_data.py:22-38`), and iterative colinear merging
(`sideface_data.py:41-80`).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.data import geometry as geo
from plankassembly_tpu.data.noise import add_noise
from plankassembly_tpu.data.packing import pack_input_sequence, pack_output_sequence


@dataclass
class Sideface:
    """A detected thin face: a center-line segment + its thickness.

    line_type: 1 = horizontal center line (face thin in y),
               0 = vertical center line (face thin in x)
    (matches `sideface_data.py:12-19,30-36`).
    """

    p0: np.ndarray
    p1: np.ndarray
    line_width: float
    line_type: int

    @property
    def coords(self) -> np.ndarray:
        return np.stack([self.p0, self.p1])

    def buffer_bounds(self) -> np.ndarray:
        """Bounds of the flat-cap buffer polygon of the center line
        (`Sideface.to_polygon` + `shapely.bounds`, `sideface_data.py:18-19,133`)."""
        d = self.p1 - self.p0
        norm = np.hypot(*d)
        if norm == 0:
            n = np.zeros(2)
        else:
            n = np.array([-d[1], d[0]]) / norm
        r = self.line_width / 2.0
        corners = np.stack([self.p0 + r * n, self.p0 - r * n,
                            self.p1 + r * n, self.p1 - r * n])
        return np.concatenate([corners.min(axis=0), corners.max(axis=0)])


def parse_sideface_from_polygons(face_bounds: np.ndarray,
                                 max_thickness: float) -> list[Sideface]:
    """Thin-rectangle detection from face bounding boxes
    (`sideface_data.py:22-38`). A face thin in y yields a horizontal
    center line; thin in x yields a vertical one (a face may yield both)."""
    sidefaces = []
    for b in np.asarray(face_bounds).reshape(-1, 4):
        (xmin, ymin, xmax, ymax) = b
        w, h = xmax - xmin, ymax - ymin
        cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
        if h < max_thickness:
            sidefaces.append(Sideface(np.array([xmin, cy]), np.array([xmax, cy]), h, 1))
        if w < max_thickness:
            sidefaces.append(Sideface(np.array([cx, ymin]), np.array([cx, ymax]), w, 0))
    return sidefaces


def merge_colinear_sidefaces(lines: list[Sideface], merge_tolerance: float,
                             min_thickness: float) -> np.ndarray:
    """Iteratively merge near-colinear sidefaces of matching type/width,
    then return the buffer bounds of survivors thicker than min_thickness
    (`merge_colinaer_sidefaces`, `sideface_data.py:41-80` — typo theirs).

    Returns (K, 4) bounds array.
    """
    merged: list[Sideface] = [lines[0]]

    for query in lines[1:]:
        colinear_indices = []
        for index in range(len(merged)):
            if not geo.segments_intersect_aabb(query.coords, merged[index].coords):
                continue
            coords = np.concatenate([query.coords, merged[index].coords])
            if ((coords[:, 0].max() - coords[:, 0].min()) < merge_tolerance
                    or (coords[:, 1].max() - coords[:, 1].min()) < merge_tolerance) \
                    and abs(query.line_width - merged[index].line_width) < merge_tolerance \
                    and query.line_type == merged[index].line_type:
                colinear_indices.append(index)

        if colinear_indices:
            coords = np.concatenate(
                [query.coords] + [merged[i].coords for i in colinear_indices])
            lo, hi = coords.min(axis=0), coords.max(axis=0)
            query = Sideface(lo, hi, query.line_width, query.line_type)
            for i in reversed(colinear_indices):
                merged.pop(i)

        merged.append(query)

    kept = [s.buffer_bounds() for s in merged if s.line_width >= min_thickness]
    return np.array(kept, dtype=np.float64).reshape(-1, 4)


def extract_sidefaces(linestrings, views, max_thickness, merge_tolerance,
                      min_thickness):
    """Per-view polygonize → thin-face detection → colinear merge
    (`SidefaceDataset.extract_sideface`, `sideface_data.py:109-135`).

    Returns (faces (K, 4) float bounds, faceviews (K,) int).
    """
    all_bounds = []
    faceviews = []

    for view_index in range(3):
        view_lines = [l for l, v in zip(linestrings, views) if v == view_index]
        if len(view_lines) == 0:
            continue

        face_bounds = geo.polygonize_bounds(view_lines)
        sidefaces = parse_sideface_from_polygons(face_bounds, max_thickness)
        if len(sidefaces) == 0:
            continue

        merged = merge_colinear_sidefaces(sidefaces, merge_tolerance, min_thickness)
        all_bounds.append(merged)
        faceviews.extend([view_index] * len(merged))

    if all_bounds:
        faces = np.concatenate(all_bounds, axis=0)
    else:
        faces = np.zeros((0, 4), dtype=np.float64)
    return faces, np.array(faceviews, dtype=np.int64)


class SidefaceDataset:
    """Map-style dataset for the sideface modality.

    cache_dir: optional packed-sample cache (`data/cache.py`) over the CLEAN
    extraction+packing — the polygonizer is the most expensive `__getitem__`
    in the framework, and the clean path is deterministic per sample.
    Augmented reads re-run extraction on noisy lines; their degenerate
    zero-face fallback IS the clean sample, so it reads from the cache too.
    """

    def __init__(self, root: str, info_files: list[str], cfg: Config,
                 augmentation: bool = False, rng=None,
                 cache_dir: str | None = None):
        self.root = root
        self.info_files = info_files
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = rng or np.random

        data = cfg.DATA
        self.max_thickness = data.MAX_THICKNESS / data.SCALE
        self.min_thickness = data.MIN_THICKNESS / data.SCALE
        self.merge_tolerance = data.MERGE_TOLERANCE / data.SCALE
        # clean (un-augmented) extractions are deterministic per sample —
        # cache them; only noisy augmentation re-runs the polygonizer
        self._clean_cache: dict[int, tuple] = {}
        self._cache = None
        if cache_dir:
            from plankassembly_tpu.data import cache as _c
            key = [type(self).__name__,
                   cfg.DATA.MAX_INPUT_LENGTH, cfg.DATA.MAX_OUTPUT_LENGTH,
                   cfg.DATA.NUM_BITS, cfg.TOKEN.END, cfg.TOKEN.PAD,
                   data.MAX_THICKNESS, data.MIN_THICKNESS,
                   data.MERGE_TOLERANCE, data.SCALE]
            key += _c.split_fingerprint(root, info_files)
            self._cache = _c.build_or_open(
                cache_dir, key, len(info_files),
                lambda i: self._pack_clean(i), progress_every=2000)

    def __len__(self) -> int:
        return len(self.info_files)

    def _load(self, index: int):
        with open(os.path.join(self.root, self.info_files[index])) as f:
            info = json.loads(f.read())
        name = info["name"]
        linestrings = [geo.from_geojson(svg) for svg in info["svgs"]]
        views = np.array(info["views"], dtype=np.int64)
        types = np.array(info["types"], dtype=np.int64)
        planks = np.array(info["coords"]).flatten()
        attach = np.array(info["attach"]).flatten()
        return name, linestrings, views, types, planks, attach

    def _clean_faces(self, index, linestrings, views):
        if index in self._clean_cache:
            return self._clean_cache[index]
        faces, faceviews = extract_sidefaces(
            linestrings, views, self.max_thickness,
            self.merge_tolerance, self.min_thickness)
        self._clean_cache[index] = (faces, faceviews)
        return faces, faceviews

    def _pack(self, faces, faceviews, planks, attach) -> dict:
        inputs = pack_input_sequence(
            faces, faceviews, None, self.cfg.DATA, self.cfg.TOKEN,
            with_type=False)
        outputs = pack_output_sequence(planks, attach, self.cfg.DATA,
                                       self.cfg.TOKEN)
        return {**inputs, **outputs}

    def _pack_clean(self, index: int) -> dict:
        _, linestrings, views, _, planks, attach = self._load(index)
        faces, faceviews = self._clean_faces(index, linestrings, views)
        return self._pack(faces, faceviews, planks, attach)

    def __getitem__(self, index: int) -> dict:
        augment = (self.augmentation
                   and self.rng.random() < self.cfg.DATA.AUG_RATIO)
        if self._cache is not None and not augment:
            name = os.path.splitext(self.info_files[index])[0].split("/")[-1]
            return {"name": name, **self._cache.row(index)}

        name, linestrings, views, types, planks, attach = self._load(index)

        faces = np.zeros((0, 4))
        faceviews = np.zeros((0,), dtype=np.int64)
        if augment:
            noisy_lines, noisy_views, _ = add_noise(
                linestrings, views, types,
                self.cfg.DATA.NOISE_RATIO, self.cfg.DATA.NOISE_LENGTH,
                rng=self.rng)
            faces, faceviews = extract_sidefaces(
                noisy_lines, noisy_views, self.max_thickness,
                self.merge_tolerance, self.min_thickness)

        # degenerate case: fall back to clean lines (`sideface_data.py:240-245`)
        if len(faces) == 0:
            if self._cache is not None:
                return {"name": name, **self._cache.row(index)}
            faces, faceviews = self._clean_faces(index, linestrings, views)

        return {"name": name, **self._pack(faces, faceviews, planks, attach)}
