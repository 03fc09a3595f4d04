import numpy as np

from my_ocr_ray.functions.geometry import (
    crop_quad,
    is_on_same_line,
    layout_reading_order,
    poly_iou,
    poly_nms,
    polygon_area,
    rect_to_quad,
    sort_vertex8,
    stitch_boxes_into_lines,
)


def test_polygon_area_unit_square():
    assert polygon_area([0, 0, 1, 0, 1, 1, 0, 1]) == 1.0


def test_poly_iou_identical_is_one():
    q = rect_to_quad(0, 0, 2, 2)
    assert abs(poly_iou(q, q) - 1.0) < 1e-9


def test_poly_iou_disjoint_is_zero():
    assert poly_iou(rect_to_quad(0, 0, 1, 1), rect_to_quad(5, 5, 6, 6)) == 0.0


def test_poly_iou_half_overlap():
    a = rect_to_quad(0, 0, 2, 1)
    b = rect_to_quad(1, 0, 3, 1)
    # inter 1, union 3
    assert abs(poly_iou(a, b) - 1 / 3) < 1e-9


def test_sort_vertex8_starts_top_left_clockwise():
    # scrambled unit square
    q = [1, 1, 0, 0, 1, 0, 0, 1]  # (1,1),(0,0),(1,0),(0,1)
    assert sort_vertex8(q) == [0, 0, 1, 0, 1, 1, 0, 1]


def test_poly_nms_suppresses_overlap_keeps_best():
    a = rect_to_quad(0, 0, 2, 2) + [0.9]
    b = rect_to_quad(0.1, 0, 2.1, 2) + [0.5]  # overlaps a
    c = rect_to_quad(10, 10, 12, 12) + [0.7]  # disjoint
    kept = poly_nms([b, a, c], iou_thr=0.1)
    assert a in kept and c in kept and b not in kept


def test_is_on_same_line():
    a = rect_to_quad(0, 0, 10, 10)
    b = rect_to_quad(20, 1, 30, 11)
    c = rect_to_quad(20, 9, 30, 19)
    assert is_on_same_line(a, b)
    assert not is_on_same_line(a, c)


def test_stitch_merges_in_x_order_and_sorts_lines_top_down():
    boxes = [
        {"box": rect_to_quad(50, 0, 80, 10), "text": "WORLD"},
        {"box": rect_to_quad(0, 30, 40, 40), "text": "LINE2"},
        {"box": rect_to_quad(0, 0, 40, 10), "text": "HELLO"},
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=15, min_y_overlap_ratio=0.8)
    assert [ln["text"] for ln in lines] == ["HELLO WORLD", "LINE2"]


def test_stitch_respects_max_x_dist():
    boxes = [
        {"box": rect_to_quad(0, 0, 10, 10), "text": "A"},
        {"box": rect_to_quad(100, 0, 110, 10), "text": "B"},
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=5)
    assert len(lines) == 2


def test_stitch_tie_break_deterministic():
    # equal x_min: stable by input index
    boxes = [
        {"box": rect_to_quad(0, 0, 10, 10), "text": "X"},
        {"box": rect_to_quad(0, 0, 10, 10), "text": "Y"},
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=5)
    assert lines[0]["text"] == "X Y"


def test_layout_reading_order_two_columns():
    left_top = rect_to_quad(0, 0, 10, 10)
    left_bot = rect_to_quad(0, 20, 10, 30)
    right_top = rect_to_quad(50, 0, 60, 10)
    order = layout_reading_order([right_top, left_bot, left_top])
    # left column first (top-down), then right column
    assert order == [2, 1, 0]


def test_crop_quad_clamps_to_image():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = crop_quad(img, rect_to_quad(0, 0, 9, 9), 0.5, 0.5)
    assert out.shape == (10, 10)
    small = crop_quad(img, rect_to_quad(4, 4, 6, 6), 0.0, 0.0)
    assert small.shape == (2, 2)


def test_stitch_staircase_chains_through_rightmost():
    """Reference chaining (box_util.py:76-84): c overlaps b but not a; the
    chain a-b-c still forms one line because the test walks the most
    recently added box."""
    from my_ocr_ray.functions.geometry import stitch_boxes_into_lines

    def quad(x0, y0, x1, y1):
        return [x0, y0, x1, y0, x1, y1, x0, y1]

    boxes = [
        {"box": quad(0, 0, 10, 10), "text": "a"},
        {"box": quad(12, 4, 22, 14), "text": "b"},   # overlaps a (60%)
        {"box": quad(24, 9, 34, 19), "text": "c"},   # overlaps b, NOT a
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=5, min_y_overlap_ratio=0.5)
    assert [ln["text"] for ln in lines] == ["a b c"]


def test_stitch_gap_splits_between_consecutive_members():
    """box_util.py:87-98: the split compares consecutive members' gap, not
    the line envelope's right edge."""
    from my_ocr_ray.functions.geometry import stitch_boxes_into_lines

    def quad(x0, y0, x1, y1):
        return [x0, y0, x1, y0, x1, y1, x0, y1]

    boxes = [
        {"box": quad(0, 0, 10, 10), "text": "a"},
        {"box": quad(12, 0, 22, 10), "text": "b"},
        {"box": quad(60, 0, 70, 10), "text": "far"},  # same line, big gap
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=5, min_y_overlap_ratio=0.5)
    assert [ln["text"] for ln in lines] == ["a b", "far"]
