"""On-device matcher vs scipy ground truth (reference matcher semantics)."""
import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from plankassembly_tpu.metrics import hungarian_match_host, program_boxes
from plankassembly_tpu.ops.matching import (
    batched_match_metrics, max_bipartite_matching, pairwise_iou_3d,
)


def test_pairwise_iou_basic():
    a = jnp.array([[0, 0, 0, 2, 2, 2]], jnp.float32)
    b = jnp.array([[1, 1, 1, 3, 3, 3], [0, 0, 0, 2, 2, 2],
                   [5, 5, 5, 6, 6, 6]], jnp.float32)
    iou = np.asarray(pairwise_iou_3d(a, b))
    np.testing.assert_allclose(iou[0], [1 / 15, 1.0, 0.0], rtol=1e-6)


def test_max_matching_vs_scipy_random():
    rng = np.random.default_rng(42)
    for _ in range(25):
        n, m = rng.integers(1, 12, 2)
        adj = rng.random((n, m)) < 0.3
        match_r = np.asarray(max_bipartite_matching(jnp.asarray(adj)))
        size = int((match_r >= 0).sum())

        # scipy reference: max cardinality == max weight of 0/1 matrix
        rows, cols = linear_sum_assignment(adj.astype(float), maximize=True)
        expected = int(adj[rows, cols].sum())
        assert size == expected, (adj, match_r)

        # validity of the matching itself
        for j, i in enumerate(match_r):
            if i >= 0:
                assert adj[i, j]
        matched_lefts = match_r[match_r >= 0]
        assert len(matched_lefts) == len(set(matched_lefts.tolist()))


def _random_boxes(rng, n):
    lo = rng.integers(0, 400, (n, 3))
    ext = rng.integers(1, 120, (n, 3))
    return np.concatenate([lo, lo + ext], axis=1).astype(np.float32)


def test_batched_metrics_vs_host_matcher():
    rng = np.random.default_rng(7)
    B, P = 6, 8
    preds = np.zeros((B, P, 6), np.float32)
    gts = np.zeros((B, P, 6), np.float32)
    pv = np.zeros((B, P), bool)
    gv = np.zeros((B, P), bool)
    for b in range(B):
        np_, ng = rng.integers(1, P + 1, 2)
        preds[b, :np_] = _random_boxes(rng, np_)
        # make some preds near-copies of gts so IoU>0.5 pairs exist
        gts[b, :ng] = _random_boxes(rng, ng)
        k = min(np_, ng)
        gts[b, :k // 2] = preds[b, :k // 2] + rng.integers(0, 3)
        pv[b, :np_] = True
        gv[b, :ng] = True

    prec, rec, f1 = batched_match_metrics(
        jnp.asarray(preds), jnp.asarray(gts), jnp.asarray(pv), jnp.asarray(gv))

    for b in range(B):
        hp, hr, hf = hungarian_match_host(preds[b][pv[b]], gts[b][gv[b]])
        np.testing.assert_allclose(float(prec[b]), hp, atol=1e-6)
        np.testing.assert_allclose(float(rec[b]), hr, atol=1e-6)
        np.testing.assert_allclose(float(f1[b]), hf, atol=1e-6)


def test_program_boxes_parsing():
    END = 512
    # program: bbox row + 2 planks + END; one plank zero-extent
    seq = np.zeros((1, 24), np.int64)
    seq[0, :6] = [0, 0, 0, 100, 100, 100]     # bbox (dropped)
    seq[0, 6:12] = [0, 0, 0, 50, 50, 50]      # valid plank
    seq[0, 12:18] = [10, 10, 10, 10, 60, 60]  # zero x-extent -> filtered
    seq[0, 18] = END
    boxes, valid = program_boxes(jnp.asarray(seq), end=END)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    assert valid.tolist() == [[False, True, False, False]]
    np.testing.assert_allclose(boxes[0, 1], [0, 0, 0, 50, 50, 50])


def test_program_boxes_no_end_token():
    seq = np.tile(np.array([0, 0, 0, 5, 5, 5], np.int64), (1, 4))  # no END
    boxes, valid = program_boxes(jnp.asarray(seq), end=512)
    # all 4 plank slots count (24 tokens = 4 rows), minus the bbox row
    assert np.asarray(valid)[0].tolist() == [False, True, True, True]


def test_hungarian_host_empty():
    assert hungarian_match_host(np.zeros((0, 6)), _random_boxes(
        np.random.default_rng(0), 3)) == (0.0, 0.0, 0.0)
