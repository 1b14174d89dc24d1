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
import warnings

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


def pack_lines(linestrings, views, types, max_lines: int):
    """Pack polylines into fixed-shape per-segment arrays for ON-DEVICE
    rasterization (`rasterize_device`): endpoints (N, 4) f32 [x0,y0,x1,y1],
    view ids (N,) i32, intensities (N,) f32 (1.0 visible / 0.5 hidden /
    0.0 pad). Device-side rasterization transfers KBs of segments per sample
    instead of a 0.75 MB image — both the HBM-transfer win and the
    workaround for the host-buffer leak in this container's remote-TPU
    transfer path (CLAUDE.md).
    """
    segs, seg_views, seg_inten = [], [], []
    dropped = 0
    for line, view, line_type in zip(linestrings, views, types):
        line = np.asarray(line, dtype=np.float32)
        inten = 1.0 if line_type == 0 else 0.5
        for k in range(len(line) - 1):
            p, q = line[k], line[k + 1]
            # device path is exact for axis-aligned segments only (all
            # PlankAssembly drawings are; noise aug preserves direction).
            # Near-axis-aligned (float jitter) snaps to the dominant axis;
            # a genuinely diagonal segment is dropped with a warning — a
            # missing line is the same corruption the delete augmentation
            # trains against, and far better than crashing the loader
            # (advisor finding r2).
            dx, dy = abs(p[0] - q[0]), abs(p[1] - q[1])
            if dx >= 1e-7 and dy >= 1e-7:
                if min(dx, dy) <= 1e-4:  # snap float jitter
                    if dx < dy:
                        q = (p[0], q[1])
                    else:
                        q = (q[0], p[1])
                else:
                    dropped += 1
                    continue
            segs.append((p[0], p[1], q[0], q[1]))
            seg_views.append(view)
            seg_inten.append(inten)
    if dropped:
        warnings.warn(f"pack_lines: dropped {dropped} non-axis-aligned "
                      "segment(s); device rasterization is axis-aligned only")
    n = len(segs)
    if n > max_lines:
        # mirror the token path's static length cap: keep the first
        # max_lines segments rather than crashing the loader
        warnings.warn(f"pack_lines: {n} segments exceed max_lines="
                      f"{max_lines}; truncating")
        segs, seg_views, seg_inten = (segs[:max_lines], seg_views[:max_lines],
                                      seg_inten[:max_lines])
        n = max_lines
    lines_arr = np.zeros((max_lines, 4), np.float32)
    views_arr = np.zeros((max_lines,), np.int32)
    inten_arr = np.zeros((max_lines,), np.float32)
    if n:
        lines_arr[:n] = np.asarray(segs, np.float32)
        views_arr[:n] = np.asarray(seg_views, np.int32)
        inten_arr[:n] = np.asarray(seg_inten, np.float32)
    return {"input_lines": lines_arr, "input_line_view": views_arr,
            "input_line_inten": inten_arr}


def rasterize_device(lines, views, intens, image_size: int,
                     supersample: int = 2, world_extent: float = 1.0):
    """Rasterize axis-aligned segments ON the TPU — exact pixel parity with
    `rasterize_lines` (tested). jax/jit; call inside the train/decode step.

    The trick: an axis-aligned segment's supersampled-splat coverage is a
    row-interval × column-interval outer product, and 2x2 max-pooling of an
    outer product is the outer product of the pooled 1-D indicators. So
    per-(view, intensity-class) coverage *counts* are plain
    (S, N) x (N, S) matmuls — MXU work, nothing scatter-shaped:

        count[b, k, i, j] = sum_n row[b,n,i] * class_k[b,n] * col[b,n,j]
        pixel = 1.0 if any visible-class count else 0.5 if any hidden else 0

    lines (B, N, 4) f32; views (B, N) i32; intens (B, N) f32 in {0, .5, 1}.
    Returns (B, 3, S, S) f32. f32 matmul accumulation keeps 0/1 sums exact.
    """
    import jax.numpy as jnp

    S = image_size
    ss = S * supersample
    scale = ss / (2.0 * world_extent)

    def to_cell(a):  # world coord -> output pixel index (host splat rule)
        cells = jnp.clip(jnp.floor((a + world_extent) * scale), 0, ss - 1)
        return cells.astype(jnp.int32) // supersample

    x_lo = to_cell(jnp.minimum(lines[..., 0], lines[..., 2]))
    x_hi = to_cell(jnp.maximum(lines[..., 0], lines[..., 2]))
    y_lo = to_cell(jnp.minimum(lines[..., 1], lines[..., 3]))
    y_hi = to_cell(jnp.maximum(lines[..., 1], lines[..., 3]))

    idx = jnp.arange(S, dtype=jnp.int32)
    rows = (idx >= y_lo[..., None]) & (idx <= y_hi[..., None])  # (B, N, S)
    cols = (idx >= x_lo[..., None]) & (idx <= x_hi[..., None])  # (B, N, S)

    view_oh = views[..., None] == jnp.arange(3)[None, None]     # (B, N, 3)
    vis = intens >= 0.75
    hid = (intens > 0.0) & ~vis
    cls = jnp.stack([vis, hid], axis=-1)                        # (B, N, 2)
    w = (view_oh[..., None] & cls[:, :, None, :])               # (B, N, 3, 2)
    B, N = intens.shape
    w6 = w.reshape(B, N, 6)

    rows6 = (rows[:, :, None, :] * w6[..., None]).astype(jnp.bfloat16)
    counts = jnp.einsum("bnks,bnt->bkst", rows6,
                        cols.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)     # (B, 6, S, S)
    counts = counts.reshape(B, 3, 2, S, S)
    any_vis = counts[:, :, 0] > 0.5
    any_hid = counts[:, :, 1] > 0.5
    return jnp.where(any_vis, 1.0,
                     jnp.where(any_hid, 0.5, 0.0)).astype(jnp.float32)


class RasterDataset:
    """Map-style dataset for the raster/ViT modality: images in, the same
    shape-program token targets out.

    device_rasterize=True (the TPU-native default) emits packed segment
    arrays (`pack_lines`) and leaves pixel drawing to `rasterize_device`
    inside the jitted step; False emits a host-drawn `input_image` (kept for
    tools and the host/device parity test)."""

    def __init__(self, root: str, info_files: list[str], cfg: Config,
                 augmentation: bool = False, rng=None,
                 image_size: int = 256, device_rasterize: bool = True,
                 cache_dir: str | None = None):
        self.root = root
        self.info_files = info_files
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = rng or np.random
        self.image_size = image_size
        self.device_rasterize = device_rasterize
        # every input token quadruple is one segment, so the token budget
        # bounds the segment count
        self.max_lines = cfg.DATA.MAX_INPUT_LENGTH // cfg.DATA.NUM_INPUT_DOF
        self._cache = None
        if cache_dir and device_rasterize:
            from plankassembly_tpu.data import cache as _c
            key = [type(self).__name__, self.max_lines,
                   cfg.DATA.MAX_OUTPUT_LENGTH, cfg.DATA.NUM_BITS,
                   cfg.TOKEN.END, cfg.TOKEN.PAD]
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
        views = np.array(info["views"], dtype=np.int64)
        types = np.array(info["types"], dtype=np.int64)

        planks = np.array(info["coords"]).flatten()
        attach = np.array(info["attach"]).flatten()

        if augment:
            linestrings, views, types = add_noise(
                linestrings, views, types,
                self.cfg.DATA.NOISE_RATIO, self.cfg.DATA.NOISE_LENGTH,
                rng=self.rng)

        outputs = pack_output_sequence(planks, attach, self.cfg.DATA,
                                       self.cfg.TOKEN)
        if self.device_rasterize:
            inputs = pack_lines(linestrings, views, types, self.max_lines)
            return name, {**inputs, **outputs}
        image = rasterize_views(linestrings, views, types, self.image_size)
        return name, {"input_image": image, **outputs}

    def __getitem__(self, index: int) -> dict:
        augment = (self.augmentation
                   and self.rng.random() < self.cfg.DATA.AUG_RATIO)
        if self._cache is not None and not augment:
            name = os.path.splitext(self.info_files[index])[0].split("/")[-1]
            return {"name": name, **self._cache.row(index)}
        name, arrays = self._pack(index, augment)
        return {"name": name, **arrays}
