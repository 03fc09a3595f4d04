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


def test_hmean_ic13_one2one():
    """Reference golden (tests/test_metrics/test_hmean_ic13.py:86-95)."""
    from my_ocr_ray.functions.metrics import (
        hmean_ic13_finalize,
        hmean_ic13_row_counts,
    )

    pred = [[0, 0, 1, 0, 1, 1, 0, 1], [10, 0, 11, 0, 11, 1, 10, 1]]
    gt = [[0, 0, 1, 0, 1, 1, 0, 1]]
    m = hmean_ic13_finalize(hmean_ic13_row_counts(pred, gt))
    assert m["recall"] == 1.0 and m["precision"] == 0.5
    assert abs(m["hmean"] - 2 * 0.5 / 1.5) < 1e-3


def test_hmean_ic13_one2many():
    """Reference golden (test_hmean_ic13.py:97-105): split detection earns
    0.8 on both sides."""
    from my_ocr_ray.functions.metrics import (
        hmean_ic13_finalize,
        hmean_ic13_row_counts,
    )

    gt = [[0, 0, 2, 0, 2, 1, 0, 1]]
    pred = [[0, 0, 1, 0, 1, 1, 0, 1], [1, 0, 2, 0, 2, 1, 1, 1]]
    c = hmean_ic13_row_counts(pred, gt)
    m = hmean_ic13_finalize(c)
    assert m["recall"] == 0.8 and m["precision"] == 0.8
    assert abs(m["hmean"] - 2 * 0.64 / 1.6) < 1e-3


def test_hmean_ic13_many2one():
    """Reference golden (test_hmean_ic13.py:107-117, precision_thr=0.6)."""
    from my_ocr_ray.functions.metrics import (
        hmean_ic13_finalize,
        hmean_ic13_row_counts,
    )

    pred = [[0, 0, 2, 0, 2, 1, 0, 1]]
    gt = [[0, 0, 1, 0, 1, 1, 0, 1], [1, 0, 2, 0, 2, 1, 1, 1]]
    c = hmean_ic13_row_counts(pred, gt, precision_thr=0.6)
    m = hmean_ic13_finalize(c)
    assert m == {"recall": 1.0, "precision": 1.0, "hmean": 1.0}


def test_hmean_ic13_ignored_gt_suppresses_pred():
    """A pred covering an ignored gt is excluded from the pred count
    (utils.py ignore_pred semantics)."""
    from my_ocr_ray.functions.metrics import (
        hmean_ic13_finalize,
        hmean_ic13_row_counts,
    )

    pred = [[0, 0, 1, 0, 1, 1, 0, 1], [5, 5, 6, 5, 6, 6, 5, 6]]
    gt = [[0, 0, 1, 0, 1, 1, 0, 1]]
    ignored = [[5, 5, 6, 5, 6, 6, 5, 6]]
    c = hmean_ic13_row_counts(pred, gt, ignored)
    assert c["pred_care"] == 1 and c["gt_care"] == 1
    m = hmean_ic13_finalize(c)
    assert m == {"recall": 1.0, "precision": 1.0, "hmean": 1.0}


def test_hmean_ic13_empty_gt_edge():
    from my_ocr_ray.functions.metrics import hmean_ic13_finalize

    assert hmean_ic13_finalize(
        {"hit_recall": 0, "hit_precision": 0, "gt_care": 0, "pred_care": 0}
    ) == {"recall": 1.0, "precision": 1.0, "hmean": 1.0}
    m = hmean_ic13_finalize(
        {"hit_recall": 0, "hit_precision": 0, "gt_care": 0, "pred_care": 3}
    )
    assert m["recall"] == 1.0 and m["precision"] == 0.0 and m["hmean"] == 0.0


# ---------------------------------------------------------------------------
# entity-level NER F1 (ner_metric.py semantics)
# ---------------------------------------------------------------------------


def test_ner_f1_reference_semantics(ray_session):
    """Pins the reference's membership rule: duplicate predictions each
    count as correct when present in gt (so recall can exceed 1),
    pred-only categories are excluded from per-category rows but count
    in 'all', and doc co-location survives a multi-block layout."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.pipelines.evaluate import ner_f1_eval

    def tbl(rows):
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "category": pa.array([r[1] for r in rows], pa.string()),
                "start": pa.array([r[2] for r in rows], pa.int64()),
                "end": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    gt = tbl([(0, "A", 1, 2), (1, "B", 1, 1), (1, "A", 4, 5)])
    pred = tbl(
        [
            (0, "A", 1, 2), (0, "A", 1, 2),  # duplicate correct pred
            (0, "B", 3, 3),                  # wrong span
            (1, "A", 4, 5),
            (1, "C", 9, 9),                  # pred-only category
        ]
    )
    out = ner_f1_eval(
        ray.data.from_arrow(gt).repartition(2),
        ray.data.from_arrow(pred).repartition(3),
    ).take_all()
    by = {r["category"]: r for r in out}
    assert set(by) == {"A", "B", "all"}  # C has no gt row
    a = by["A"]
    assert (a["n_gt"], a["n_pred"], a["n_correct"]) == (2, 3, 3)
    assert a["rec"] == 1.5 and a["prec"] == 1.0  # reference allows rec > 1
    assert a["f1"] == 1.2
    b = by["B"]
    assert (b["n_gt"], b["n_pred"], b["n_correct"]) == (1, 1, 0)
    assert b["prec"] == 0.0 and b["rec"] == 0.0 and b["f1"] == 0.0
    al = by["all"]
    assert (al["n_gt"], al["n_pred"], al["n_correct"]) == (3, 5, 3)
    assert al["prec"] == 0.6 and al["rec"] == 1.0
    assert al["f1"] == 0.75
