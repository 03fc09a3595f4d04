import numpy as np

from my_ocr_ray.functions.graphs import (
    clusters2labels,
    connected_components_edges,
    min_connect_path,
    row_col_f1,
)


def test_connected_components_edges():
    comps = connected_components_edges(6, [(0, 1), (1, 2), (4, 5)])
    assert comps == [[0, 1, 2], [3], [4, 5]]


def test_clusters2labels():
    labels = clusters2labels([[0, 1], [2]], 3)
    assert list(labels) == [0, 0, 1]


def test_min_connect_path_orders_chain():
    pts = [(10, 0), (0, 0), (5, 0), (20, 0)]
    path = min_connect_path(pts)
    assert path == [1, 2, 0, 3]  # left-to-right chain from smallest point
    assert min_connect_path([]) == []


def test_row_col_f1_perfect_and_partial():
    # 4 cells in a 2x2 table: rows {0,1},{2,3}; cols {0,2},{1,3}
    rows = [(0, 1), (2, 3)]
    cols = [(0, 2), (1, 3)]
    assert row_col_f1(rows, cols, rows, cols, 4) == 1.0
    # predicted rows merge everything -> row F1 drops, col F1 stays
    bad_rows = [(0, 1), (1, 2), (2, 3)]
    score = row_col_f1(bad_rows, cols, rows, cols, 4)
    assert 0.0 < score < 1.0


def test_graph_propagation_dedup_and_length_zeroing():
    """wrapper.py:544-591 semantics: duplicate edges average scores; edges
    longer than edge_len_thr (component-center distance) get score 0."""
    import numpy as np

    from my_ocr_ray.functions.graphs import graph_propagation

    comps = np.array(
        [
            [0, 0, 1, 0, 1, 1, 0, 1, 0.9],
            [2, 0, 3, 0, 3, 1, 2, 1, 0.9],
            [100, 0, 101, 0, 101, 1, 100, 1, 0.9],
        ]
    )
    edges = [[0, 1], [1, 0], [0, 2]]
    scores = [0.8, 0.4, 0.99]
    nodes, adj, sd = graph_propagation(edges, scores, comps, edge_len_thr=50.0)
    assert list(nodes) == [0, 1, 2]
    assert sd[(0, 1)] == 0.5 * (0.8 + 0.4)  # duplicate edge averaged
    assert sd[(0, 2)] == 0.0                # 100-px edge zeroed
    assert sorted(adj[0]) == [1, 2]


def test_connected_components_scored_threshold():
    from my_ocr_ray.functions.graphs import (
        connected_components_scored,
        graph_propagation,
    )

    nodes, adj, sd = graph_propagation(
        [[0, 1], [1, 2], [3, 4]], [0.9, 0.2, 0.8], None
    )
    clusters = connected_components_scored(nodes, sd, link_thr=0.5)
    assert clusters == [[0, 1], [2], [3, 4]]
