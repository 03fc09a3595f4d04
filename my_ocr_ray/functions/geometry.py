"""Geometry kernels: quads, polygon IoU, NMS, line stitching, reading order.

Pure numpy reimplementations of the reference's per-image geometry (no cv2,
no shapely, no pyclipper):

- ``sort_vertex8``      — ``mmocr/datasets/pipelines/box_utils.py:6-54``
- ``poly_iou`` family   — ``mmocr/core/evaluation/utils.py:96-210``
- ``poly_nms``          — ``mmocr/models/textdet/postprocess/wrapper.py:477-498``
- ``stitch_boxes_into_lines`` / ``is_on_same_line``
                        — ``mmocr/utils/box_util.py:4-117``
- ``crop_quad``         — ``mmocr/datasets/pipelines/crop.py:86-124``

All functions are deterministic with stable (score, index) tie-breaks so the
pipeline is bit-stable across parallelism levels.
"""
from __future__ import annotations

import numpy as np


def quad_to_rect(quad) -> tuple[float, float, float, float]:
    """Axis-aligned bbox (x0, y0, x1, y1) of an 8-coord quad."""
    q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    return float(q[:, 0].min()), float(q[:, 1].min()), float(q[:, 0].max()), float(q[:, 1].max())


def rect_to_quad(x0: float, y0: float, x1: float, y1: float) -> list[float]:
    """Clockwise-from-top-left 8-coord quad of an axis-aligned rect."""
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def sort_vertex8(quad) -> list[float]:
    """Reorder a quad's 4 vertices clockwise starting from top-left.

    Top-left = vertex minimizing (x + y), then clockwise by angle around the
    centroid (reference semantics of ``box_utils.sort_vertex``).
    """
    pts = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    center = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    order = np.argsort(ang, kind="stable")  # CCW from -pi; screen-coords => CW visual
    pts = pts[order]
    start = int(np.argmin(pts.sum(axis=1)))
    pts = np.roll(pts, -start, axis=0)
    return [float(v) for v in pts.reshape(-1)]


def polygon_area(poly: np.ndarray) -> float:
    """Signed-area magnitude via the shoelace formula (Green's theorem,
    cf. ``base_textdet_targets.py:54-70``)."""
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def _clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of polygon ``subject`` by convex ``clip``."""
    output = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        if not output:
            break
        input_pts, output = output, []
        edge = (b[0] - a[0], b[1] - a[1])

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) <= 0

        def intersect(p, q):
            dp = (q[0] - p[0], q[1] - p[1])
            denom = edge[0] * dp[1] - edge[1] * dp[0]
            if denom == 0:
                return q
            t = (edge[0] * (a[1] - p[1]) - edge[1] * (a[0] - p[0])) / denom
            return (p[0] + t * dp[0], p[1] + t * dp[1])

        s = input_pts[-1]
        for e in input_pts:
            if inside(e):
                if not inside(s):
                    output.append(intersect(s, e))
                output.append(tuple(e))
            elif inside(s):
                output.append(intersect(s, e))
            s = e
    return np.array(output, dtype=np.float64) if output else np.zeros((0, 2))


def _ensure_cw(p: np.ndarray) -> np.ndarray:
    x, y = p[:, 0], p[:, 1]
    signed = (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0
    return p if signed <= 0 else p[::-1]


def poly_intersection_area(a, b) -> float:
    """Intersection area of two convex polygons (flat coord lists or Nx2)."""
    pa = _ensure_cw(np.asarray(a, dtype=np.float64).reshape(-1, 2))
    pb = _ensure_cw(np.asarray(b, dtype=np.float64).reshape(-1, 2))
    inter = _clip_polygon(pa, pb)
    if len(inter) < 3:
        return 0.0
    return polygon_area(inter)


def poly_iou(a, b) -> float:
    """IoU of two convex polygons (``utils.poly_iou`` semantics)."""
    ia = poly_intersection_area(a, b)
    ua = polygon_area(a) + polygon_area(b) - ia
    if ua <= 0:
        return 0.0
    return ia / ua


def poly_nms(boundaries: list[list[float]], iou_thr: float = 0.1) -> list[list[float]]:
    """Greedy NMS over boundaries ``[x1,y1,...,xk,yk,score]``.

    Reference ``wrapper.py:477-498``: sort ascending by score, repeatedly keep
    the max-score boundary and suppress overlaps with IoU > thr.  Ties broken
    by original index (stable sort) for bit-stability.
    """
    idx = sorted(range(len(boundaries)), key=lambda i: (boundaries[i][-1], i))
    keep: list[list[float]] = []
    while idx:
        i = idx.pop()  # max score
        b = boundaries[i]
        keep.append(b)
        idx = [j for j in idx if poly_iou(b[:-1], boundaries[j][:-1]) <= iou_thr]
    return keep


def y_overlap_ratio(box_a, box_b) -> float:
    """Vertical overlap / min height of two quads (``box_util.is_on_same_line``)."""
    _, ay0, _, ay1 = quad_to_rect(box_a)
    _, by0, _, by1 = quad_to_rect(box_b)
    inter = min(ay1, by1) - max(ay0, by0)
    minh = min(ay1 - ay0, by1 - by0)
    if minh <= 0:
        return 0.0
    return max(0.0, inter) / minh


def is_on_same_line(box_a, box_b, min_y_overlap_ratio: float = 0.8) -> bool:
    return y_overlap_ratio(box_a, box_b) >= min_y_overlap_ratio


def stitch_boxes_into_lines(
    boxes: list[dict], max_x_dist: float = 10.0, min_y_overlap_ratio: float = 0.8
) -> list[dict]:
    """Merge word boxes ``{'box': [8 floats], 'text': str}`` into lines.

    Reference ``mmocr/utils/box_util.py:42-117``: sort by x_min; chain a line
    through the most recently added box's y-overlap, then split the chain at
    x-gaps > ``max_x_dist`` between consecutive members; concatenate texts
    with spaces in x order; merged box is the envelope.  Divergence (by
    design, documented): output lines are additionally sorted top-to-bottom
    then left-to-right so downstream ordering is deterministic (the
    reference emits in x-sorted seed order).
    """
    if not boxes:
        return []
    rect = [quad_to_rect(b["box"]) for b in boxes]  # computed once per box

    def same_line(i: int, j: int) -> bool:
        inter = min(rect[i][3], rect[j][3]) - max(rect[i][1], rect[j][1])
        minh = min(rect[i][3] - rect[i][1], rect[j][3] - rect[j][1])
        return minh > 0 and max(0.0, inter) / minh >= min_y_overlap_ratio

    order = sorted(range(len(boxes)), key=lambda i: (rect[i][0], i))
    used = [False] * len(boxes)
    lines: list[dict] = []
    for pos, oi in enumerate(order):
        if used[oi]:
            continue
        used[oi] = True
        # chain through the most recently added (rightmost) box, exactly as
        # the reference does (box_util.py:76-84) — a staircase of boxes that
        # pairwise overlap chains into one line even when later members no
        # longer overlap the seed
        chain = [oi]
        rightmost = oi
        for oj in order[pos + 1 :]:
            if used[oj]:
                continue
            if same_line(rightmost, oj):
                used[oj] = True
                chain.append(oj)
                rightmost = oj
        # split the chain where the x-gap between CONSECUTIVE members
        # exceeds max_x_dist (box_util.py:87-98)
        sublines = [[chain[0]]]
        for k in range(1, len(chain)):
            if rect[chain[k]][0] - rect[chain[k - 1]][2] > max_x_dist:
                sublines.append([])
            sublines[-1].append(chain[k])
        for members in sublines:
            text = " ".join(boxes[i]["text"] for i in members)
            x0 = min(rect[i][0] for i in members)
            y0 = min(rect[i][1] for i in members)
            x1 = max(rect[i][2] for i in members)
            y1 = max(rect[i][3] for i in members)
            lines.append(
                {"box": rect_to_quad(x0, y0, x1, y1), "text": text,
                 "_y": y0, "_x": x0}
            )
    lines.sort(key=lambda d: (d.pop("_y"), d.pop("_x")))
    return lines


def layout_reading_order(boxes: list) -> list[int]:
    """Reading-order permutation of box indices: cluster into columns by
    x-extent overlap, order columns left-to-right, rows top-to-bottom inside
    a column (the PDF-layout analog; new design, no reference counterpart)."""
    if not boxes:
        return []
    rects = [quad_to_rect(b) for b in boxes]
    order = sorted(range(len(boxes)), key=lambda i: (rects[i][0], i))
    columns: list[list[int]] = []
    col_spans: list[tuple[float, float]] = []
    for i in order:
        x0, _, x1, _ = rects[i]
        placed = False
        for c, (cx0, cx1) in enumerate(col_spans):
            inter = min(x1, cx1) - max(x0, cx0)
            if inter > 0.5 * min(x1 - x0, cx1 - cx0):
                columns[c].append(i)
                col_spans[c] = (min(cx0, x0), max(cx1, x1))
                placed = True
                break
        if not placed:
            columns.append([i])
            col_spans.append((x0, x1))
    cols = sorted(zip(col_spans, columns), key=lambda t: t[0][0])
    out: list[int] = []
    for _, members in cols:
        members.sort(key=lambda i: (rects[i][1], rects[i][0], i))
        out.extend(members)
    return out


def crop_quad(
    img: np.ndarray, quad, long_edge_pad_ratio: float = 0.4, short_edge_pad_ratio: float = 0.2
) -> np.ndarray:
    """Axis-aligned crop of a quad with font-size-proportional padding.

    Reference ``crop.py:86-124``: pad = shorter-edge-length * ratio, applied to
    the long (x) and short (y) directions, clamped to the image.
    """
    h, w = img.shape[:2]
    x0, y0, x1, y1 = quad_to_rect(quad)
    shorter = min(x1 - x0, y1 - y0)
    dx = int(round(shorter * long_edge_pad_ratio))
    dy = int(round(shorter * short_edge_pad_ratio))
    cx0 = max(0, int(np.floor(x0)) - dx)
    cy0 = max(0, int(np.floor(y0)) - dy)
    cx1 = min(w, int(np.ceil(x1)) + dx)
    cy1 = min(h, int(np.ceil(y1)) + dy)
    return img[cy0:cy1, cx0:cx1]


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull; returns CCW-in-math-coords hull
    vertices (Nx2), deterministic."""
    pts = np.unique(np.asarray(points, dtype=np.float64).reshape(-1, 2), axis=0)
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points) -> list[float]:
    """Minimum-area enclosing rectangle (rotating calipers over hull edges),
    the cv2.minAreaRect analog used by ``points2boundary``
    (``mmocr/core/mask.py:7-50``). Returns 8 coords clockwise from top-left.
    """
    hull = convex_hull(np.asarray(points, dtype=np.float64).reshape(-1, 2))
    if len(hull) == 1:
        x, y = hull[0]
        return [x, y, x, y, x, y, x, y]
    if len(hull) == 2:
        (x0, y0), (x1, y1) = hull
        return sort_vertex8([x0, y0, x1, y1, x1, y1, x0, y0])
    best = None
    n = len(hull)
    for i in range(n):
        edge = hull[(i + 1) % n] - hull[i]
        norm = np.linalg.norm(edge)
        if norm == 0:
            continue
        ux = edge / norm
        uy = np.array([-ux[1], ux[0]])
        xs = hull @ ux
        ys = hull @ uy
        area = (xs.max() - xs.min()) * (ys.max() - ys.min())
        if best is None or area < best[0] - 1e-12:
            corners = [
                xs.min() * ux + ys.min() * uy,
                xs.max() * ux + ys.min() * uy,
                xs.max() * ux + ys.max() * uy,
                xs.min() * ux + ys.max() * uy,
            ]
            best = (area, corners)
    return sort_vertex8([float(v) for c in best[1] for v in c])


def unclip_polygon(poly, unclip_ratio: float = 1.5) -> list[float]:
    """Dilate a convex polygon outward by the DBNet unclip distance
    ``d = area * ratio / perimeter`` (``wrapper.py:168-174`` semantics;
    pyclipper replaced by exact convex edge-offset + line intersection)."""
    p = _ensure_cw(np.asarray(poly, dtype=np.float64).reshape(-1, 2))
    n = len(p)
    area = polygon_area(p.reshape(-1))
    perimeter = float(
        np.linalg.norm(np.diff(np.vstack([p, p[:1]]), axis=0), axis=1).sum()
    )
    if perimeter == 0:
        return [float(v) for v in p.reshape(-1)]
    d = area * unclip_ratio / perimeter
    # offset each edge outward (CW in screen coords -> outward normal is
    # the left normal), then intersect consecutive offset edge lines
    lines = []
    for i in range(n):
        a, b = p[i], p[(i + 1) % n]
        e = b - a
        norm = np.linalg.norm(e)
        if norm == 0:
            continue
        nvec = np.array([-e[1], e[0]]) / norm  # outward for _ensure_cw output
        lines.append((a + nvec * d, b + nvec * d))
    out = []
    m = len(lines)
    for i in range(m):
        (a1, b1), (a2, b2) = lines[i], lines[(i + 1) % m]
        d1, d2 = b1 - a1, b2 - a2
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            out.append(b1)
            continue
        t = ((a2[0] - a1[0]) * d2[1] - (a2[1] - a1[1]) * d2[0]) / denom
        out.append(a1 + t * d1)
    return [float(v) for pt in out for v in pt]


def filter_boundaries_by_score(
    boundaries: list[list[float]], min_score: float
) -> list[list[float]]:
    """Score-threshold boundary filter (``filter_2dlist_result`` /
    ``select_top_boundary``, ``mmocr/core/evaluation/utils.py:385-464``)."""
    return [b for b in boundaries if b[-1] >= min_score]


def point_to_line_distance(point, a, b) -> float:
    """Distance from ``point`` to segment line ``a``-``b``
    (``base_textdet_targets.py:18-52`` analog)."""
    p = np.asarray(point, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ab = b - a
    denom = np.linalg.norm(ab)
    if denom == 0:
        return float(np.linalg.norm(p - a))
    return float(abs(ab[0] * (a[1] - p[1]) - ab[1] * (a[0] - p[0])) / denom)


def fourier2poly(coeffs: np.ndarray, n_points: int = 50) -> np.ndarray:
    """Reconstruct a closed polygon from complex Fourier coefficients via
    inverse DFT (``wrapper.py:501-522`` FCENet semantics): ``coeffs`` is a
    (2k+1,) complex vector ordered [-k..0..k]; returns (n_points, 2)."""
    c = np.asarray(coeffs, dtype=np.complex128)
    k = (len(c) - 1) // 2
    t = np.arange(n_points) / n_points
    freqs = np.arange(-k, k + 1)
    pts = (c[None, :] * np.exp(2j * np.pi * freqs[None, :] * t[:, None])).sum(axis=1)
    return np.stack([pts.real, pts.imag], axis=1)


def merge_disks(disks, disk_overlap_thr: float = 0.8) -> list[list[float]]:
    """TextSnake disk merging (``wrapper.py:275-303`` semantics): sort disks
    ``[x, y, r, score]`` by score descending (index tie-break), greedily keep
    a disk and absorb others whose center distance is below
    ``thr * (r_i + r_j)``."""
    order = sorted(
        range(len(disks)), key=lambda i: (-disks[i][3], i)
    )
    kept: list[list[float]] = []
    used = [False] * len(disks)
    for i in order:
        if used[i]:
            continue
        used[i] = True
        xi, yi, ri, si = disks[i]
        for j in order:
            if used[j]:
                continue
            xj, yj, rj, _ = disks[j]
            if ((xi - xj) ** 2 + (yi - yj) ** 2) ** 0.5 < disk_overlap_thr * (ri + rj):
                used[j] = True
        kept.append(list(disks[i]))
    return kept
