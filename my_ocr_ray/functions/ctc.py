"""CTC greedy decode — pure numpy reimplementation of the reference semantics.

Reference: ``mmocr/models/textrecog/convertors/ctc.py:85-144`` (tensor2idx):
per row, frames are trimmed to ``ceil(valid_ratio * T)``, argmaxed per frame,
then collapsed by dropping repeats and blanks; per-char score is the max
probability of the frames that produced the char.

Class layout here: indices ``0..C-1`` are characters, ``C`` is the CTC blank
(the convertor appends blank last, cf. ``convertors/ctc.py:24-33``).
"""
from __future__ import annotations

import math

import numpy as np


def ctc_greedy_decode(
    logits: np.ndarray, blank: int, valid_ratio: float = 1.0
) -> tuple[list[int], list[float]]:
    """Collapse a (T, C) frame-logit matrix to (char indices, char scores).

    ``valid_ratio`` trims trailing pad frames exactly like the reference
    (``ctc.py:106-110``: ``decode_len = min(T, ceil(T * valid_ratio))``).
    """
    t_total = logits.shape[0]
    t = min(t_total, int(math.ceil(t_total * valid_ratio)))
    if t <= 0:
        return [], []
    frames = logits[:t]
    idx = frames.argmax(axis=1)
    val = frames.max(axis=1)
    out: list[int] = []
    scores: list[float] = []
    prev = -1
    cur_best = 0.0
    for i in range(t):
        k = int(idx[i])
        if k != prev:
            if prev != -1 and prev != blank:
                out.append(prev)
                scores.append(float(cur_best))
            prev = k
            cur_best = float(val[i])
        else:
            cur_best = max(cur_best, float(val[i]))
    if prev != -1 and prev != blank:
        out.append(prev)
        scores.append(float(cur_best))
    return out, scores


def ctc_collapse_indices(indices: list[int] | np.ndarray, blank: int) -> list[int]:
    """Collapse an index sequence (drop repeats then blanks)."""
    out: list[int] = []
    prev = -1
    for k in indices:
        k = int(k)
        if k != prev and k != blank:
            out.append(k)
        prev = k
    return out


def indices_to_text(indices: list[int], charset: str) -> str:
    return "".join(charset[i] for i in indices)
