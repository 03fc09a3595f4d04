import numpy as np

from my_ocr_ray.functions.ctc import (
    ctc_beam_search,
    ctc_greedy_decode,
    ctc_topk_frames,
    merge_aug_results,
)
from my_ocr_ray.functions.pixels import (
    connected_components,
    fill_hole,
    seg_decode,
)

BLANK = 36


def _logits(seq, n_classes=37, peak=0.9):
    m = np.full((len(seq), n_classes), (1 - peak) / (n_classes - 1), dtype=np.float64)
    for t, k in enumerate(seq):
        m[t, k] = peak
    return m


def test_connected_components_counts_and_scan_order():
    mask = np.zeros((5, 7), dtype=bool)
    mask[1, 1:3] = True       # comp 1
    mask[3:5, 4:6] = True     # comp 2
    n, labels = connected_components(mask)
    assert n == 2
    assert labels[1, 1] == 1 and labels[3, 4] == 2
    assert (labels[mask] > 0).all() and (labels[~mask] == 0).all()


def test_connected_components_u_shape_merges():
    # U shape: two vertical arms joined at the bottom -> ONE component
    mask = np.zeros((4, 5), dtype=bool)
    mask[0:4, 0] = True
    mask[0:4, 4] = True
    mask[3, 0:5] = True
    n, labels = connected_components(mask)
    assert n == 1


def test_fill_hole():
    ring = np.zeros((7, 7), dtype=bool)
    ring[1:6, 1:6] = True
    ring[2:5, 2:5] = False  # hole
    filled = fill_hole(ring)
    assert filled[3, 3]  # hole filled
    assert not filled[0, 0]  # outside untouched


def test_seg_decode_orders_by_centroid():
    cm = np.full((4, 12), 99, dtype=np.int32)  # background=99
    cm[1:3, 8:10] = 11  # 'B' right
    cm[1:3, 1:3] = 10   # 'A' left
    out = seg_decode(cm, background=99, charset="0123456789AB")
    assert out == "AB"


def test_topk_frames():
    logits = _logits([3, 5])
    idx, vals = ctc_topk_frames(logits, 2)
    assert idx[0][0] == 3 and idx[1][0] == 5
    assert vals.shape == (2, 2) and (vals[:, 0] >= vals[:, 1]).all()


def test_beam_search_agrees_with_greedy_on_peaked_frames():
    seq = [5, 5, BLANK, 5, BLANK, 7]
    logits = _logits(seq)
    greedy, _ = ctc_greedy_decode(logits.astype(np.float32), blank=BLANK)
    beams = ctc_beam_search(logits, blank=BLANK, beam_width=5)
    assert beams[0][0] == greedy == [5, 5, 7]
    assert beams[0][1] >= beams[-1][1]


def test_beam_search_repeat_collapse_probability():
    # two frames, same char, no blank: prefix beam must collapse to one char
    logits = _logits([2, 2])
    best = ctc_beam_search(logits, blank=BLANK, beam_width=3)[0]
    assert best[0] == [2]


def test_merge_aug_results():
    assert merge_aug_results([("abc", 0.4), ("abd", 0.9), ("abe", 0.9)]) == (
        "abd",
        0.9,
    )
    assert merge_aug_results([]) == ("", 0.0)


def test_merge_disks_absorbs_overlapping():
    from my_ocr_ray.functions.geometry import merge_disks

    disks = [
        [0, 0, 5, 0.9],
        [1, 0, 5, 0.5],    # overlaps the first -> absorbed
        [100, 0, 5, 0.7],  # far away -> kept
    ]
    kept = merge_disks(disks)
    assert kept == [[0, 0, 5, 0.9], [100, 0, 5, 0.7]]


def test_attention_greedy_decode():
    from my_ocr_ray.functions.ctc import attention_greedy_decode

    EOS, PAD = 37, 38
    seq = [5, PAD, 7, EOS, 9]
    logits = _logits(seq, n_classes=39)
    idx, scores = attention_greedy_decode(logits, eos=EOS, pad=PAD)
    assert idx == [5, 7]
    assert len(scores) == 2 and all(abs(s - 0.9) < 1e-6 for s in scores)


def test_decode_variants_golden_equality(ray_session):
    """Pipeline-level golden: CTC greedy, width-5 beam, attention and seg
    decodes all recover the exact rendered ground truth (flips the three
    kernel-only decoder rows to pipeline-covered)."""
    from my_ocr_ray.pipelines.queries import q_decode_variants

    rows = q_decode_variants("/root/testdata/sf0.001", n_docs=60).take_all()
    assert rows, "no media rows"
    for r in rows:
        assert (
            r["gt_text"] == r["text_greedy"] == r["text_beam"]
            == r["text_attn"] == r["text_seg"]
        ), r
