import numpy as np

from my_ocr_ray.functions.geometry import (
    convex_hull,
    filter_boundaries_by_score,
    min_area_rect,
    polygon_area,
    rect_to_quad,
    unclip_polygon,
)


def test_convex_hull_square_with_interior():
    pts = [[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.7]]
    hull = convex_hull(np.array(pts))
    assert len(hull) == 4
    assert set(map(tuple, hull.tolist())) == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_min_area_rect_axis_aligned():
    q = min_area_rect([[0, 0], [4, 0], [4, 2], [0, 2], [2, 1]])
    assert q == [0, 0, 4, 0, 4, 2, 0, 2]


def test_min_area_rect_rotated():
    # diamond: min-area rect is the rotated square itself, area 2 (not the
    # axis-aligned bbox, area 4)
    q = min_area_rect([[1, 0], [2, 1], [1, 2], [0, 1]])
    assert abs(polygon_area(q) - 2.0) < 1e-9


def test_unclip_square_distance_formula():
    quad = rect_to_quad(10, 10, 20, 20)  # area 100, perimeter 40
    out = unclip_polygon(quad, unclip_ratio=2.0)  # d = 100*2/40 = 5
    p = np.asarray(out).reshape(-1, 2)
    assert p[:, 0].min() == 5 and p[:, 0].max() == 25
    assert p[:, 1].min() == 5 and p[:, 1].max() == 25
    assert abs(polygon_area(out) - 400.0) < 1e-9


def test_unclip_grows_outward_not_inward():
    quad = rect_to_quad(0, 0, 8, 2)
    out = np.asarray(unclip_polygon(quad, 1.5)).reshape(-1, 2)
    assert polygon_area(out.reshape(-1)) > polygon_area(np.asarray(quad))


def test_filter_boundaries_by_score():
    b1 = rect_to_quad(0, 0, 1, 1) + [0.9]
    b2 = rect_to_quad(0, 0, 1, 1) + [0.2]
    assert filter_boundaries_by_score([b1, b2], 0.5) == [b1]
