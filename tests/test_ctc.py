import numpy as np

from my_ocr_ray.functions.ctc import (
    ctc_collapse_indices,
    ctc_greedy_decode,
    indices_to_text,
)

BLANK = 36


def _logits(seq, n_classes=37):
    m = np.full((len(seq), n_classes), 0.01, dtype=np.float32)
    for t, k in enumerate(seq):
        m[t, k] = 0.9
    return m


def test_collapse_repeats_and_blanks():
    # A A blank A B B -> A A B (repeat across blank kept; adjacent repeat merged)
    seq = [0, 0, BLANK, 0, 1, 1]
    assert ctc_collapse_indices(seq, BLANK) == [0, 0, 1]


def test_greedy_decode_matches_collapse():
    seq = [5, 5, BLANK, 5, BLANK, BLANK, 7, 7]
    idx, scores = ctc_greedy_decode(_logits(seq), blank=BLANK)
    assert idx == [5, 5, 7]
    assert len(scores) == 3 and all(abs(s - 0.9) < 1e-6 for s in scores)


def test_valid_ratio_trims_pad_frames():
    # valid prefix says "A"; pad region says "B" and must be ignored
    seq = [0, 0, BLANK] + [1] * 7
    full, _ = ctc_greedy_decode(_logits(seq), blank=BLANK, valid_ratio=1.0)
    assert full == [0, 1]
    trimmed, _ = ctc_greedy_decode(_logits(seq), blank=BLANK, valid_ratio=0.3)
    assert trimmed == [0]


def test_empty_and_all_blank():
    idx, sc = ctc_greedy_decode(_logits([BLANK, BLANK]), blank=BLANK)
    assert idx == [] and sc == []


def test_indices_to_text():
    assert indices_to_text([10, 11, 0], "0123456789ABC") == "AB0"


def test_ctc_char_score_is_first_frame_of_run():
    """Reference tensor2idx (convertors/ctc.py:124-130) records the
    TRANSITION frame's probability, not the run max."""
    import numpy as np

    from my_ocr_ray.functions.ctc import ctc_greedy_decode

    # frames: class 0 at p=0.6 then repeated at p=0.9 -> score must be 0.6
    frames = np.array(
        [
            [0.6, 0.1, 0.3],
            [0.9, 0.05, 0.05],
            [0.1, 0.1, 0.8],  # blank (class 2)
            [0.2, 0.7, 0.1],
        ],
        dtype=np.float32,
    )
    idxs, scores = ctc_greedy_decode(frames, blank=2)
    assert idxs == [0, 1]
    assert scores == [np.float32(0.6), np.float32(0.7)]
