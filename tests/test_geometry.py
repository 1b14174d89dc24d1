"""Tests for the numpy geometry core (shapely/GEOS replacement)."""
import numpy as np

from plankassembly_tpu.data import geometry as geo


def test_bounds_and_length():
    line = geo.linestring([[0, 0], [3, 4]])
    np.testing.assert_allclose(geo.bounds(line), [0, 0, 3, 4])
    assert geo.length(line) == 5.0


def test_interpolate_forward_and_negative():
    line = geo.linestring([[0, 0], [10, 0]])
    np.testing.assert_allclose(geo.interpolate(line, 2.5), [2.5, 0])
    np.testing.assert_allclose(geo.interpolate(line, -2.5), [7.5, 0])
    np.testing.assert_allclose(geo.interpolate(line, 100), [10, 0])  # clamp


def test_geojson_round_trip():
    line = geo.linestring([[0.25, -0.5], [1.0, 2.0]])
    rt = geo.from_geojson(geo.to_geojson(line))
    np.testing.assert_allclose(rt, line)


def test_polygonize_single_rectangle():
    # 4 segments forming a unit square -> one face
    sq = [
        geo.linestring([[0, 0], [1, 0]]),
        geo.linestring([[1, 0], [1, 1]]),
        geo.linestring([[1, 1], [0, 1]]),
        geo.linestring([[0, 1], [0, 0]]),
    ]
    faces = geo.polygonize_bounds(sq)
    assert faces.shape == (1, 4)
    np.testing.assert_allclose(faces[0], [0, 0, 1, 1])


def test_polygonize_two_cells_with_divider():
    # square with a vertical divider -> two faces
    segs = [
        geo.linestring([[0, 0], [2, 0]]),
        geo.linestring([[2, 0], [2, 1]]),
        geo.linestring([[2, 1], [0, 1]]),
        geo.linestring([[0, 1], [0, 0]]),
        geo.linestring([[1, 0], [1, 1]]),
    ]
    faces = geo.polygonize_bounds(segs)
    assert faces.shape == (2, 4)
    faces = faces[np.argsort(faces[:, 0])]
    np.testing.assert_allclose(faces[0], [0, 0, 1, 1])
    np.testing.assert_allclose(faces[1], [1, 0, 2, 1])


def test_polygonize_open_lines_no_face():
    segs = [
        geo.linestring([[0, 0], [1, 0]]),
        geo.linestring([[1, 0], [1, 1]]),
        geo.linestring([[1, 1], [0, 1]]),
        # left side missing -> not enclosed
    ]
    assert geo.polygonize_bounds(segs).shape == (0, 4)


def test_polygonize_dangling_interior_line():
    # dangle inside the square must not create extra faces
    segs = [
        geo.linestring([[0, 0], [2, 0]]),
        geo.linestring([[2, 0], [2, 2]]),
        geo.linestring([[2, 2], [0, 2]]),
        geo.linestring([[0, 2], [0, 0]]),
        geo.linestring([[1, 0], [1, 1]]),  # dangle: doesn't split the face
    ]
    faces = geo.polygonize_bounds(segs)
    assert faces.shape == (1, 4)
    np.testing.assert_allclose(faces[0], [0, 0, 2, 2])
