"""HyperLogLog sketch: accuracy bound, merge determinism, distributed
per-group estimates vs exact."""
import numpy as np
import pyarrow as pa
import pytest

from my_ocr_ray.sketches import (
    grouped_hll_distinct,
    hash64_strings,
    hll_estimate,
    hll_registers,
)


def test_hll_accuracy_across_cardinalities():
    for true_n in (50, 500, 5000, 50000):
        h = hash64_strings([f"v{i}" for i in range(true_n)])
        est = hll_estimate(hll_registers(h, 12))
        # sigma ~ 1.04/sqrt(4096) = 1.6%; small range uses linear counting
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_duplicates_do_not_inflate():
    h = hash64_strings(["a", "b", "c"] * 1000)
    est = hll_estimate(hll_registers(h, 12))
    assert 2.5 < est < 3.5


def test_hll_merge_order_independent():
    h = hash64_strings([f"v{i}" for i in range(10000)])
    chunks = [hll_registers(h[i::8], 12) for i in range(8)]
    m1 = np.maximum.reduce(chunks)
    m2 = np.maximum.reduce(chunks[::-1])
    assert (m1 == m2).all()
    assert hll_estimate(m1) == hll_estimate(hll_registers(h, 12))


def test_grouped_hll_matches_exact_within_bound(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 20000
    groups = rng.choice(["a", "b"], n)
    vals = rng.integers(0, 4000, n)
    t = pa.Table.from_pydict(
        {
            "g": pa.array(groups.tolist(), pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = grouped_hll_distinct(
        ray.data.from_arrow(t).repartition(4), "g", "v", p=12
    ).take_all()
    import pandas as pd

    exact = t.to_pandas().groupby("g")["v"].nunique()
    for r in out:
        e = exact[r["g"]]
        assert abs(r["n_distinct_approx"] - e) / e < 0.05
