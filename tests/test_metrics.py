from my_ocr_ray.functions.geometry import rect_to_quad
from my_ocr_ray.functions.metrics import (
    edit_distance,
    hmean_finalize,
    hmean_iou_row_counts,
    ocr_finalize,
    ocr_row_counts,
)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


def test_ocr_metrics_perfect():
    sums = {k: 0 for k in (
        "match", "match_ignore_case", "match_ignore_case_symbol",
        "true_positive_char", "gt_char", "pred_char", "norm_ed", "count")}
    for pred, gt in [("HELLO", "HELLO"), ("World", "World")]:
        c = ocr_row_counts(pred, gt)
        for k in sums:
            sums[k] += c[k]
    m = ocr_finalize(sums)
    assert m["word_acc"] == 1.0 and m["char_recall"] == 1.0 and m["1-N.E.D"] == 1.0


def test_ocr_metrics_case_and_symbol_levels():
    c = ocr_row_counts("hello!", "HELLO")
    assert c["match"] == 0
    assert c["match_ignore_case"] == 0  # "hello!" != "hello"
    assert c["match_ignore_case_symbol"] == 1  # symbol stripped


def test_hmean_iou_identical_boxes():
    """Reference golden: identical gt/pred -> recall=precision=hmean=1
    (tests/test_metrics/test_hmean_iou.py:34-41)."""
    boxes = [rect_to_quad(0, 0, 1, 1), rect_to_quad(2, 0, 3, 1)]
    c = hmean_iou_row_counts(boxes, boxes)
    m = hmean_finalize(c)
    assert m == {"recall": 1.0, "precision": 1.0, "hmean": 1.0}


def test_hmean_iou_partial():
    gt = [rect_to_quad(0, 0, 1, 1), rect_to_quad(5, 5, 6, 6)]
    pred = [rect_to_quad(0, 0, 1, 1)]
    m = hmean_finalize(hmean_iou_row_counts(pred, gt))
    assert m["recall"] == 0.5 and m["precision"] == 1.0
