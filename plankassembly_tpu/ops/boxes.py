"""3D axis-aligned box operations (jnp; functional).

Complete functional port of the reference's `third_party/boxes.py` (a
detectron2 Boxes class extended to 3D). Boxes are (N, 6) arrays
(x1, y1, z1, x2, y2, z2); everything is stateless/jit-friendly instead of a
tensor-wrapping class.

Note: the reference's `matched_pairwise_iou` has a latent 2D-only bug
(`boxes.py:288` computes inter = wh[:,0]*wh[:,1], ignoring depth). It is
unused there; our version is corrected (documented deviation, SURVEY.md §7).
"""
from __future__ import annotations

import jax.numpy as jnp

from plankassembly_tpu.ops.matching import pairwise_iou_3d as pairwise_iou  # noqa: F401


def volume(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N,) volumes (`boxes.py:51-60`)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    return jnp.prod(boxes[:, 3:] - boxes[:, :3], axis=-1)


def clip(boxes: jnp.ndarray, box_size) -> jnp.ndarray:
    """Clamp coordinates into [0, w] x [0, h] x [0, d] (`boxes.py:62-78`)."""
    w, h, d = box_size
    hi = jnp.asarray([w, h, d, w, h, d], jnp.float32)
    return jnp.clip(jnp.asarray(boxes, jnp.float32), 0.0, hi)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """(N,) bool: every side longer than threshold (`boxes.py:80-95`)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    sides = boxes[:, 3:] - boxes[:, :3]
    return (sides > threshold).all(axis=-1)


def inside_box(boxes: jnp.ndarray, box_size, boundary_threshold: int = 0):
    """(N,) bool: box within the reference box (`boxes.py:127-146`)."""
    w, h, d = box_size
    b = jnp.asarray(boxes, jnp.float32)
    t = boundary_threshold
    return ((b[:, 0] >= -t) & (b[:, 1] >= -t) & (b[:, 2] >= -t)
            & (b[:, 3] < w + t) & (b[:, 4] < h + t) & (b[:, 5] < d + t))


def get_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) centers (`boxes.py:148-153`)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    return (boxes[:, :3] + boxes[:, 3:]) / 2.0


def scale(boxes: jnp.ndarray, sx: float, sy: float, sz: float) -> jnp.ndarray:
    """Per-axis scaling (`boxes.py:155-161`)."""
    return jnp.asarray(boxes, jnp.float32) * jnp.asarray(
        [sx, sy, sz, sx, sy, sz], jnp.float32)


def cat(boxes_list) -> jnp.ndarray:
    """Concatenate box arrays (`boxes.py:163-181`)."""
    if not boxes_list:
        return jnp.zeros((0, 6), jnp.float32)
    return jnp.concatenate([jnp.asarray(b, jnp.float32).reshape(-1, 6)
                            for b in boxes_list], axis=0)


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """(N, M) intersection volumes (`boxes.py:197-215`)."""
    b1 = jnp.asarray(boxes1, jnp.float32)
    b2 = jnp.asarray(boxes2, jnp.float32)
    lwh = (jnp.minimum(b1[:, None, 3:], b2[None, :, 3:])
           - jnp.maximum(b1[:, None, :3], b2[None, :, :3]))
    return jnp.prod(jnp.clip(lwh, min=0.0), axis=-1)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) intersection over boxes2 volume (`boxes.py:245-262`)."""
    vol2 = volume(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / vol2[None, :], 0.0)


def matched_pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """(N,) IoU of matched (paired) boxes — 3D-correct version of
    `boxes.py:265-290` (the reference drops the depth term)."""
    b1 = jnp.asarray(boxes1, jnp.float32)
    b2 = jnp.asarray(boxes2, jnp.float32)
    lt = jnp.maximum(b1[:, :3], b2[:, :3])
    rb = jnp.minimum(b1[:, 3:], b2[:, 3:])
    inter = jnp.prod(jnp.clip(rb - lt, min=0.0), axis=-1)
    return inter / (volume(b1) + volume(b2) - inter)
