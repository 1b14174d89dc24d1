"""Evaluation metrics: device-resident program→boxes parsing, the running
criterion, and a scipy host matcher for bit-parity offline scoring.

- `program_boxes` turns raw decoded token streams into padded box tensors +
  validity masks entirely on device (replacing the per-sample Python loop at
  `trainer_complete.py:76-81`).
- `Criterion` accumulates macro-averaged precision/recall/F1 like the
  reference torchmetrics state (`plankassembly/metric.py:6-30`).
- `hungarian_match_host` reproduces `third_party/matcher.py:29-61`
  bit-for-bit via scipy (used by the offline evaluator).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.ops.matching import batched_match_metrics


@partial(jax.jit, static_argnames=("end", "dof", "drop_bbox", "drop_zero_extent"))
def program_boxes(samples: jnp.ndarray, end: int = 512, dof: int = 6,
                  drop_bbox: bool = True, drop_zero_extent: bool = True):
    """Parse decoded token streams into box tensors on device.

    samples: (B, S) int tokens. Equivalent of `parse_sequence`
    (`models.py:258-265`) + bbox-row drop + zero-extent filtering
    (`trainer_complete.py:79-81`), with static shapes:

    Returns (boxes (B, P, 6) float32, valid (B, P) bool) where
    P = S // dof and row 0 (global bbox) is marked invalid when
    `drop_bbox` (it still occupies slot 0 so indices match plank ids).
    """
    B, S = samples.shape
    P = S // dof
    hit = samples == end
    any_end = hit.any(axis=1)
    first_end = jnp.where(any_end, jnp.argmax(hit, axis=1), S)
    num_planks = first_end // dof  # (B,)

    boxes = samples[:, : P * dof].reshape(B, P, dof).astype(jnp.float32)
    ids = jnp.arange(P)[None, :]
    valid = ids < num_planks[:, None]
    if drop_bbox:
        valid = valid & (ids >= 1)
    if drop_zero_extent:
        # zero-extent planks are filtered on the prediction side only
        # (`trainer_complete.py:79-81`; GT passes through unfiltered)
        extent = jnp.abs(boxes[..., dof // 2:] - boxes[..., : dof // 2])
        valid = valid & (extent != 0).all(axis=-1)
    return boxes, valid


def batch_scores(pred_samples, gt_samples, end: int = 512, dof: int = 6,
                 threshold: float = 0.5):
    """(B,) per-sample precision/recall/F1 from raw token streams, on device."""
    pred_boxes, pred_valid = program_boxes(pred_samples, end=end, dof=dof)
    gt_boxes, gt_valid = program_boxes(gt_samples, end=end, dof=dof,
                                       drop_zero_extent=False)
    return batched_match_metrics(pred_boxes, gt_boxes, pred_valid, gt_valid,
                                 threshold=threshold)


@partial(jax.jit, static_argnames=("end", "dof", "threshold"))
def metric_sums(pred_samples, gt_samples, valid, end: int = 512, dof: int = 6,
                threshold: float = 0.5):
    """(sum_prec, sum_rec, sum_f1, count) over valid rows, as replicated
    scalars — the multi-host-safe form of `batch_scores` + masking: scalar
    reductions over batch-sharded inputs come back fully replicated, so
    every process can read them without a host gather (the torchmetrics
    `dist_reduce_fx="sum"` analog, `plankassembly/metric.py:13-16`)."""
    prec, rec, f1 = batch_scores(pred_samples, gt_samples, end=end, dof=dof,
                                 threshold=threshold)
    v = valid.astype(jnp.float32)
    return ((prec * v).sum(), (rec * v).sum(), (f1 * v).sum(), v.sum())


class Criterion:
    """Macro-averaged running precision/recall/F1
    (`plankassembly/metric.py:6-30`). Accumulates on host floats; updates
    accept scalars or arrays (summed)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.precision = 0.0
        self.recall = 0.0
        self.fmeasure = 0.0
        self.total = 0

    def update(self, prec, rec, f1, count: int = 1):
        self.precision += float(np.sum(prec))
        self.recall += float(np.sum(rec))
        self.fmeasure += float(np.sum(f1))
        self.total += int(count)

    def update_batch(self, prec, rec, f1, valid_mask=None):
        prec, rec, f1 = np.asarray(prec), np.asarray(rec), np.asarray(f1)
        if valid_mask is not None:
            mask = np.asarray(valid_mask)
            prec, rec, f1 = prec[mask], rec[mask], f1[mask]
        self.update(prec, rec, f1, count=prec.size)

    def compute(self):
        total = max(self.total, 1)
        return (self.precision / total, self.recall / total,
                self.fmeasure / total)


def build_criterion() -> Criterion:
    return Criterion()


LARGE_COST_VALUE = 100000


def hungarian_match_host(pred_boxes: np.ndarray, gt_boxes: np.ndarray,
                         threshold: float = 0.5):
    """Bit-parity reimplementation of the reference matcher
    (`third_party/matcher.py:29-61`) on numpy/scipy. Returns
    (prec, rec, f1) floats."""
    from scipy.optimize import linear_sum_assignment

    pred_boxes = np.asarray(pred_boxes, dtype=np.float32).reshape(-1, 6)
    gt_boxes = np.asarray(gt_boxes, dtype=np.float32).reshape(-1, 6)
    num_pred, num_label = len(pred_boxes), len(gt_boxes)

    if num_pred == 0 or num_label == 0:
        # scipy on an empty cost matrix matches nothing; reference returns
        # prec/rec zeros via its guards (`matcher.py:57-58`)
        return 0.0, 0.0, 0.0

    vol1 = np.prod(pred_boxes[:, 3:] - pred_boxes[:, :3], axis=-1)
    vol2 = np.prod(gt_boxes[:, 3:] - gt_boxes[:, :3], axis=-1)
    lwh = (np.minimum(pred_boxes[:, None, 3:], gt_boxes[None, :, 3:])
           - np.maximum(pred_boxes[:, None, :3], gt_boxes[None, :, :3]))
    inter = np.prod(np.clip(lwh, 0, None), axis=-1)
    union = vol1[:, None] + vol2[None, :] - inter
    iou = np.where(inter > 0, inter / np.where(union == 0, 1, union), 0.0)

    cost = np.full((num_pred, num_label), LARGE_COST_VALUE, dtype=np.float64)
    cost[iou > threshold] = -1
    rows, cols = linear_sum_assignment(cost)

    tp = float(np.sum(iou[rows, cols] >= threshold))
    prec = tp / num_pred
    rec = tp / num_label
    f1 = prec * rec * 2 / (prec + rec + 1e-10)
    return prec, rec, f1
