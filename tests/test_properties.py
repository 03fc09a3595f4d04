"""Property-based tests (hypothesis): invariants the unit goldens can't sweep.

The reference has no property tests (SURVEY.md §5); these pin the engine's
determinism and order-invariance guarantees over random inputs.
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from my_ocr_ray.functions.ctc import (
    ctc_beam_search,
    ctc_collapse_indices,
    ctc_greedy_decode,
)
from my_ocr_ray.functions.geometry import (
    poly_iou,
    rect_to_quad,
    stitch_boxes_into_lines,
)
from my_ocr_ray.functions.imaging import DICT36, render_text_image
from my_ocr_ray.functions.ocr import detect_word_boxes, recognize_word
from my_ocr_ray.functions.textproc import jaccard_ngrams, minhash_signature

BLANK = 36

words = st.text(alphabet=DICT36, min_size=1, max_size=8)
lines = st.lists(
    st.lists(words, min_size=1, max_size=4).map(" ".join),
    min_size=1,
    max_size=3,
)


@settings(max_examples=30, deadline=None)
@given(lines=lines, scale=st.integers(1, 3))
def test_render_ocr_roundtrip_property(lines, scale):
    """Any DICT36 text renders and OCRs back exactly (the engine's core
    correctness invariant, over arbitrary strings)."""
    img = render_text_image(lines, scale=scale)
    out = []
    for b in detect_word_boxes(img, scale=scale):
        x0, y0, x1, y1 = int(b[0]), int(b[1]), int(b[4]), int(b[5])
        text, _ = recognize_word(img[y0:y1, x0:x1], scale=scale)
        out.append({"box": b[:8], "text": text})
    merged = stitch_boxes_into_lines(out, max_x_dist=10 * scale, min_y_overlap_ratio=0.5)
    assert "\n".join(m["text"] for m in merged) == "\n".join(lines)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, BLANK), min_size=1, max_size=40))
def test_ctc_collapse_idempotent_and_blankfree(seq):
    once = ctc_collapse_indices(seq, BLANK)
    assert BLANK not in once
    # collapsing an already-collapsed repeat-free sequence only merges
    # adjacent repeats; collapsing via greedy decode agrees on peaked logits
    m = np.full((len(seq), BLANK + 1), 0.001, dtype=np.float32)
    for t, k in enumerate(seq):
        m[t, k] = 0.9
    idx, _ = ctc_greedy_decode(m, blank=BLANK)
    assert idx == once


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=6))
def test_beam_search_top1_matches_greedy_on_peaked(seq):
    m = np.full((len(seq), BLANK + 1), 0.0005, dtype=np.float64)
    for t, k in enumerate(seq):
        m[t, k] = 0.95
    greedy, _ = ctc_greedy_decode(m.astype(np.float32), blank=BLANK)
    assert ctc_beam_search(m, blank=BLANK, beam_width=4)[0][0] == greedy


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=6))
def test_stitch_is_input_order_invariant_on_disjoint_lines(points):
    """Boxes on clearly separate lines stitch identically regardless of
    input order (determinism across shuffles)."""
    boxes = [
        {"box": rect_to_quad(x, 100 * i, x + 20, 100 * i + 10), "text": f"W{i}"}
        for i, (x, _) in enumerate(points)
    ]
    a = stitch_boxes_into_lines(list(boxes), max_x_dist=5)
    b = stitch_boxes_into_lines(list(reversed(boxes)), max_x_dist=5)
    assert [ln["text"] for ln in a] == [ln["text"] for ln in b]


@settings(max_examples=40, deadline=None)
@given(st.floats(0, 40, allow_nan=False), st.floats(0, 40, allow_nan=False))
def test_iou_symmetric_and_bounded(dx, dy):
    a = rect_to_quad(0, 0, 10, 10)
    b = rect_to_quad(dx, dy, dx + 10, dy + 10)
    ab, ba = poly_iou(a, b), poly_iou(b, a)
    assert abs(ab - ba) < 1e-9
    assert 0.0 <= ab <= 1.0 + 1e-9


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcdef ", max_size=60), st.text(alphabet="abcdef ", max_size=60))
def test_jaccard_bounds_and_identity(a, b):
    assert jaccard_ngrams(a, a) == 1.0
    s = jaccard_ngrams(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaccard_ngrams(b, a)


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="abc xyz", max_size=80))
def test_minhash_deterministic_and_fixed_len(text):
    from my_ocr_ray.functions.textproc import MOD_P, minhash_sigs_matrix

    s1 = minhash_signature(text, num_hashes=6)
    s2 = minhash_signature(text, num_hashes=6)
    assert s1 == s2 and len(s1) == 6
    assert all(0 <= h < MOD_P for h in s1)
    # vectorized batch kernel == scalar reference
    assert list(minhash_sigs_matrix([text], num_hashes=6)[0]) == s1
