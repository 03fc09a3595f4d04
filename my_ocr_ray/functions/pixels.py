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
    from 1 in scan order (deterministic).
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    nxt = 1
    for y in range(h):
        row = mask[y]
        for x in range(w):
            if not row[x]:
                continue
            up = labels[y - 1, x] if y > 0 else 0
            left = labels[y, x - 1] if x > 0 else 0
            if up == 0 and left == 0:
                parent.append(nxt)
                labels[y, x] = nxt
                nxt += 1
            elif up and left:
                labels[y, x] = min(up, left)
                union(up, left)
            else:
                labels[y, x] = up or left
    # second pass: resolve + renumber in scan order
    remap: dict[int, int] = {}
    out = np.zeros_like(labels)
    count = 0
    flat = labels.reshape(-1)
    res = out.reshape(-1)
    for i in range(flat.size):
        v = flat[i]
        if v == 0:
            continue
        r = find(int(v))
        if r not in remap:
            count += 1
            remap[r] = count
        res[i] = remap[r]
    return count, out


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
