"""Graph grouping kernels: edge connected components, cluster labels,
min-connect path, table row/col F1.

Pure-python/numpy analogs of the reference's DRRG grouping utilities
(``graph_propagation`` / ``connected_components`` / ``clusters2labels`` /
``min_connect_path``, ``mmocr/models/textdet/postprocess/wrapper.py:544-741``)
and the fork's table-structure metric (``cal_row_col_f1``,
``mmocr/core/evaluation/kie_metric.py:78-126``). All per-record local —
used inside ``map_batches``, never a shuffle.
"""
from __future__ import annotations

import numpy as np


def connected_components_edges(n_nodes: int, edges) -> list[list[int]]:
    """Union-find components of an undirected edge list; components and
    their members sorted ascending (deterministic)."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for i in range(n_nodes):
        groups.setdefault(find(i), []).append(i)
    return [sorted(v) for _, v in sorted(groups.items())]


def clusters2labels(clusters: list[list[int]], n_nodes: int) -> np.ndarray:
    """Component list -> per-node label vector (``wrapper.py`` semantics)."""
    labels = np.full(n_nodes, -1, dtype=np.int64)
    for lbl, members in enumerate(clusters):
        for m in members:
            labels[m] = lbl
    return labels


def min_connect_path(points) -> list[int]:
    """Greedy nearest-neighbour chain through 2-D points, starting from the
    lexicographically smallest point; ties broken by index
    (``min_connect_path`` analog for ordering text components)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return []
    start = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
    unvisited = set(range(n)) - {start}
    path = [start]
    while unvisited:
        cur = pts[path[-1]]
        best = min(
            unvisited,
            key=lambda i: (float(np.linalg.norm(pts[i] - cur)), i),
        )
        unvisited.remove(best)
        path.append(best)
    return path


def graph_propagation(edges, scores, text_comps=None, edge_len_thr: float = 50.0):
    """Edge-score graph construction (``mmocr/models/textdet/postprocess/
    wrapper.py:544-591`` behavior, vectorized): edges sorted per row, scores
    of over-length edges (component-center distance > ``edge_len_thr``)
    zeroed, duplicate edges' scores averaged.  Returns (sorted node array,
    adjacency dict, {(a, b): score} dict with a < b)."""
    edges = np.sort(np.asarray(edges, dtype=np.int64).reshape(-1, 2), axis=1)
    scores = np.asarray(scores, dtype=np.float64).copy()
    if text_comps is not None and len(edges):
        boxes = np.asarray(text_comps, dtype=np.float64)[:, :8].reshape(-1, 4, 2)
        centers = boxes.mean(axis=1)
        dist = np.linalg.norm(
            centers[edges[:, 0]] - centers[edges[:, 1]], axis=1
        )
        scores[dist > edge_len_thr] = 0.0
    score_dict: dict[tuple[int, int], float] = {}
    for (a, b), s in zip(edges, scores):
        key = (int(a), int(b))
        score_dict[key] = (
            0.5 * (score_dict[key] + float(s)) if key in score_dict else float(s)
        )
    nodes = np.sort(np.unique(edges)) if len(edges) else np.empty(0, np.int64)
    adjacency: dict[int, list[int]] = {int(n): [] for n in nodes}
    for a, b in score_dict:
        adjacency[a].append(b)
        adjacency[b].append(a)
    return nodes, adjacency, score_dict


def connected_components_scored(
    nodes, score_dict: dict, link_thr: float
) -> list[list[int]]:
    """Score-thresholded clustering over a propagated graph
    (``wrapper.py:594-627`` semantics): only edges with score >= link_thr
    link; nodes whose every edge is below threshold become singleton
    clusters.  Deterministic output: members sorted, clusters sorted by
    first member."""
    ids = [int(n) for n in nodes]
    index = {n: i for i, n in enumerate(ids)}
    kept = [
        (index[a], index[b])
        for (a, b), s in score_dict.items()
        if s >= link_thr
    ]
    comps = connected_components_edges(len(ids), kept)
    return sorted(
        ([ids[i] for i in comp] for comp in comps), key=lambda c: c[0]
    )


def group_f1(pred_edges, gt_edges, n_cells: int) -> float:
    """Set-equality F1 between the connected-component groupings induced by
    two edge lists (UNROUNDED): tp = exactly-matching groups,
    prec = tp/|pred groups|, rec = tp/|gt groups|."""

    def group_sets(edges):
        return {
            tuple(c) for c in connected_components_edges(n_cells, edges)
        }

    p, g = group_sets(pred_edges), group_sets(gt_edges)
    tp = len(p & g)
    prec = tp / len(p) if p else 0.0
    rec = tp / len(g) if g else 0.0
    return 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0


def row_col_f1(
    pred_row_edges, pred_col_edges, gt_row_edges, gt_col_edges, n_cells: int
) -> float:
    """Table-structure F1 (fork's ``cal_row_col_f1``): group cells into
    rows/cols by edge connected components, score set-equality of the
    predicted vs ground-truth groupings, average row and col F1.
    Rounded ties-away-from-zero so results compare exactly against
    DuckDB ``round()`` in the ``kie_rowcol`` oracle."""
    from .num import round_away_scalar

    return round_away_scalar(
        (
            group_f1(pred_row_edges, gt_row_edges, n_cells)
            + group_f1(pred_col_edges, gt_col_edges, n_cells)
        )
        / 2,
        4,
    )
