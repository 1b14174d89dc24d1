"""On-device batched box matching metrics.

The reference scores each sample by Hungarian-matching predicted vs GT 3D
boxes on CPU (`third_party/matcher.py:29-61`: scipy linear_sum_assignment
over a cost matrix of -1 for IoU>thr pairs and 1e5 otherwise) — a
device→host sync per sample. Because every above-threshold pair costs the
same (-1), the assignment problem reduces exactly to *maximum-cardinality
bipartite matching* on the IoU>thr graph; tp = matching size. We solve that
directly on device with a BFS augmenting-path algorithm under
`lax.while_loop` (boxes per sample <= ~21, so this is tiny), vmapped over
the batch — no host round-trips inside the eval loop.

(Equivalence caveat, documented: scipy's complete matching may additionally
pair below-threshold boxes; such pairs only count toward tp when IoU ==
threshold exactly, a measure-zero tie the reference itself resolves
arbitrarily. `plankassembly_tpu/metrics.py` keeps a scipy host path for
bit-parity offline scoring.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between all pairs of 3D boxes (x1,y1,z1,x2,y2,z2).

    boxes1 (N, 6), boxes2 (M, 6) -> (N, M). Mirrors `third_party/
    boxes.py:197-242` (empty/degenerate boxes yield IoU 0).
    """
    b1, b2 = boxes1.astype(jnp.float32), boxes2.astype(jnp.float32)
    vol1 = jnp.prod(b1[:, 3:] - b1[:, :3], axis=-1)
    vol2 = jnp.prod(b2[:, 3:] - b2[:, :3], axis=-1)
    lwh = (jnp.minimum(b1[:, None, 3:], b2[None, :, 3:])
           - jnp.maximum(b1[:, None, :3], b2[None, :, :3]))
    inter = jnp.prod(jnp.clip(lwh, min=0.0), axis=-1)
    union = vol1[:, None] + vol2[None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)


def max_bipartite_matching(adj: jnp.ndarray) -> jnp.ndarray:
    """Maximum-cardinality matching of a bipartite adjacency matrix.

    adj: (N, M) bool. Returns match_r (M,) int32 — for each right node the
    matched left node or -1. Kuhn's algorithm with BFS augmenting paths,
    fully static shapes.
    """
    N, M = adj.shape

    def augment(carry, start):
        match_l, match_r = carry

        # --- BFS for an augmenting path from left node `start` ---
        def bfs_cond(state):
            _, _, frontier_l, found_j, done = state
            return ~done

        def bfs_body(state):
            visited_r, parent_r, frontier_l, found_j, done = state
            reach = frontier_l[:, None] & adj  # (N, M)
            cand = reach.any(axis=0) & ~visited_r  # (M,) newly reached rights
            # pick any reaching left as parent (argmax -> lowest index)
            parents = jnp.argmax(reach, axis=0).astype(jnp.int32)
            parent_r = jnp.where(cand, parents, parent_r)
            visited_r = visited_r | cand

            free = cand & (match_r == -1)
            has_free = free.any()
            found_j = jnp.where(
                has_free, jnp.argmax(free).astype(jnp.int32), found_j)

            # next frontier: left partners of newly visited matched rights
            matched_new = cand & (match_r != -1)
            next_l = jnp.zeros((N,), bool).at[
                jnp.where(matched_new, match_r, N)  # N = dropped
            ].set(True, mode="drop")
            done = has_free | ~cand.any()
            return visited_r, parent_r, next_l, found_j, done

        init = (jnp.zeros((M,), bool), jnp.full((M,), -1, jnp.int32),
                jnp.zeros((N,), bool).at[start].set(True),
                jnp.array(-1, jnp.int32), jnp.array(False))
        _, parent_r, _, found_j, _ = jax.lax.while_loop(bfs_cond, bfs_body, init)

        # --- flip the augmenting path (if one was found) ---
        def flip_cond(state):
            j, _, _ = state
            return j != -1

        def flip_body(state):
            j, match_l, match_r = state
            i = parent_r[j]
            prev_j = match_l[i]
            match_r = match_r.at[j].set(i)
            match_l = match_l.at[i].set(j)
            return prev_j, match_l, match_r

        j0 = found_j
        _, match_l2, match_r2 = jax.lax.while_loop(
            flip_cond, flip_body, (j0, match_l, match_r))
        match_l = jnp.where(found_j >= 0, match_l2, match_l)
        match_r = jnp.where(found_j >= 0, match_r2, match_r)
        return (match_l, match_r), None

    init = (jnp.full((N,), -1, jnp.int32), jnp.full((M,), -1, jnp.int32))
    (match_l, match_r), _ = jax.lax.scan(augment, init, jnp.arange(N))
    return match_r


def match_metrics(pred_boxes, gt_boxes, pred_valid, gt_valid, threshold=0.5):
    """Per-sample precision/recall/F1 (`matcher.py:40-61` semantics).

    pred_boxes (N, 6), gt_boxes (M, 6) with validity masks. Returns
    (prec, rec, f1) float32 scalars.
    """
    iou = pairwise_iou_3d(pred_boxes, gt_boxes)
    adj = (iou > threshold) & pred_valid[:, None] & gt_valid[None, :]
    match_r = max_bipartite_matching(adj)
    tp = (match_r >= 0).sum().astype(jnp.float32)

    num_pred = pred_valid.sum().astype(jnp.float32)
    num_label = gt_valid.sum().astype(jnp.float32)
    prec = jnp.where(num_pred > 0, tp / jnp.maximum(num_pred, 1), 0.0)
    rec = jnp.where(num_label > 0, tp / jnp.maximum(num_label, 1), 0.0)
    f1 = prec * rec * 2 / (prec + rec + 1e-10)
    return prec, rec, f1


@partial(jax.jit, static_argnames=("threshold",))
def batched_match_metrics(pred_boxes, gt_boxes, pred_valid, gt_valid,
                          threshold: float = 0.5):
    """vmapped per-sample metrics: inputs have a leading batch axis."""
    return jax.vmap(partial(match_metrics, threshold=threshold))(
        pred_boxes, gt_boxes, pred_valid, gt_valid)
