"""Pixel-map kernels: connected components, hole filling, seg-style decode.

Pure-numpy stand-ins for the cv2/mmcv.ops pixel kernels the reference's
decode paths use:

- ``connected_components``  — cv2.connectedComponents equivalent (two-pass
  union-find, 4-connectivity), as used by the detector decodes
  (``mmocr/models/textdet/postprocess/wrapper.py:69-77``).
- ``fill_hole``             — flood-fill from the border, invert
  (``wrapper.py:232-242``).
- ``seg_decode``            — SegOCR-style decode: components over an argmax
  class map -> majority char per component -> sort by x-centroid -> text
  (``mmocr/models/textrecog/convertors/seg.py:55-124``).
"""
from __future__ import annotations

import numpy as np


def connected_components(mask: np.ndarray) -> tuple[int, np.ndarray]:
    """4-connected component labeling of a bool mask.

    Returns (n_labels, label map) with background=0 and components numbered
    from 1 in scan order (deterministic). Run-based two-pass: horizontal
    runs are extracted vectorized, union-find operates on RUNS (tens per
    image) instead of pixels — same output as a pixel-wise pass because a
    run is by construction one 4-connected unit, and run order is scan
    order so component numbering matches the first-pixel scan order.
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    if h == 0 or w == 0:
        return 0, labels
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    ys, xs = np.nonzero(d == 1)    # run start columns (row-major order)
    _, xe = np.nonzero(d == -1)    # run end columns, exclusive (same order)
    n_runs = ys.size
    if n_runs == 0:
        return 0, labels
    parent = list(range(n_runs))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # runs of consecutive rows overlap columns -> same component
    row_ptr = np.searchsorted(ys, np.arange(h + 1))
    xs_l, xe_l = xs.tolist(), xe.tolist()
    for y in range(1, h):
        i, i_end = int(row_ptr[y - 1]), int(row_ptr[y])
        j, j_end = i_end, int(row_ptr[y + 1])
        while i < i_end and j < j_end:
            if xs_l[i] < xe_l[j] and xs_l[j] < xe_l[i]:
                ra, rb = find(i), find(j)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            if xe_l[i] <= xe_l[j]:
                i += 1
            else:
                j += 1
    # renumber roots in first-run (= first-pixel scan) order, paint runs
    remap: dict[int, int] = {}
    count = 0
    ys_l = ys.tolist()
    for i in range(n_runs):
        r = find(i)
        c = remap.get(r)
        if c is None:
            count += 1
            c = remap[r] = count
        labels[ys_l[i], xs_l[i]:xe_l[i]] = c
    return count, labels


def fill_hole(mask: np.ndarray) -> np.ndarray:
    """Fill enclosed holes: BFS flood from the border over background, then
    anything not reached is foreground (``wrapper.py:232-242`` semantics)."""
    h, w = mask.shape
    bg = ~mask
    reach = np.zeros((h, w), dtype=bool)
    stack = []
    for x in range(w):
        for y in (0, h - 1):
            if bg[y, x] and not reach[y, x]:
                reach[y, x] = True
                stack.append((y, x))
    for y in range(h):
        for x in (0, w - 1):
            if bg[y, x] and not reach[y, x]:
                reach[y, x] = True
                stack.append((y, x))
    while stack:
        y, x = stack.pop()
        for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
            if 0 <= ny < h and 0 <= nx < w and bg[ny, nx] and not reach[ny, nx]:
                reach[ny, nx] = True
                stack.append((ny, nx))
    return ~reach


def seg_decode(class_map: np.ndarray, background: int, charset: str) -> str:
    """Seg-recognition decode: label the non-background argmax map, take the
    majority class per component, order components by x-centroid."""
    mask = class_map != background
    n, labels = connected_components(mask)
    items = []
    for comp in range(1, n + 1):
        sel = labels == comp
        vals, counts = np.unique(class_map[sel], return_counts=True)
        # majority class, ties -> smaller class id (stable)
        cls = int(vals[np.lexsort((vals, -counts))[0]])
        xs = np.nonzero(sel)[1]
        items.append((float(xs.mean()), comp, charset[cls]))
    items.sort()
    return "".join(ch for _, _, ch in items)
