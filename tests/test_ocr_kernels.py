import numpy as np

from my_ocr_ray.functions.geometry import quad_to_rect, stitch_boxes_into_lines
from my_ocr_ray.functions.imaging import DICT36, render_text_image
from my_ocr_ray.functions.ocr import (
    detect_word_boxes,
    pad_frame_batch,
    recognize_word,
    word_frame_logits,
    binarize,
    BLANK_IDX,
)


def _roundtrip(lines, scale):
    img = render_text_image(lines, scale=scale)
    words = []
    for b in detect_word_boxes(img, scale=scale):
        x0, y0, x1, y1 = (int(v) for v in quad_to_rect(b[:8]))
        text, _ = recognize_word(img[y0:y1, x0:x1], scale=scale)
        words.append({"box": b[:8], "text": text})
    merged = stitch_boxes_into_lines(
        words, max_x_dist=10 * scale, min_y_overlap_ratio=0.5
    )
    return "\n".join(m["text"] for m in merged)


def test_single_word():
    assert _roundtrip(["HELLO"], 2) == "HELLO"


def test_double_letters_ctc():
    # adjacent identical glyphs must survive CTC collapse (blank separation)
    assert _roundtrip(["AABB", "LLL"], 2) == "AABB\nLLL"


def test_multiline_multiword_scales():
    rng = np.random.default_rng(42)
    for scale in (1, 2, 3):
        for _ in range(10):
            lines = []
            for _ in range(int(rng.integers(1, 4))):
                words = [
                    "".join(DICT36[k] for k in rng.integers(0, 36, int(rng.integers(1, 9))))
                    for _ in range(int(rng.integers(1, 5)))
                ]
                lines.append(" ".join(words))
            assert _roundtrip(lines, scale) == "\n".join(lines)


def test_detect_empty_image():
    img = np.full((20, 40), 255, dtype=np.uint8)
    assert detect_word_boxes(img, scale=2) == []


def test_pad_frame_batch_valid_ratio():
    f1 = word_frame_logits(binarize(render_text_image(["AB"], 2)), 2)
    f2 = word_frame_logits(binarize(render_text_image(["ABCDEF"], 2)), 2)
    batch, ratios = pad_frame_batch([f1, f2])
    assert batch.shape[0] == 2 and batch.shape[1] == f2.shape[0]
    assert ratios[1] == 1.0 and 0 < ratios[0] < 1.0
    # pad region is blank-peaked
    assert batch[0, -1].argmax() == BLANK_IDX


def test_detection_scores_are_densities():
    img = render_text_image(["A"], 2)
    boxes = detect_word_boxes(img, scale=2)
    assert len(boxes) == 1 and 0.0 < boxes[0][-1] <= 1.0


def test_detect_word_boxes_max_candidates():
    """DB postprocessor contour cap (wrapper.py:189-193): emission stops at
    max_candidates in detection order."""
    import numpy as np

    from my_ocr_ray.functions.imaging import render_text_image
    from my_ocr_ray.functions.ocr import detect_word_boxes

    img = render_text_image(["AA BB CC", "DD EE"], scale=2)
    all_boxes = detect_word_boxes(img, scale=2)
    assert len(all_boxes) == 5
    capped = detect_word_boxes(img, scale=2, max_candidates=3)
    assert capped == all_boxes[:3]
