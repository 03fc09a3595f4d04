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


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_when_wide():
    from my_ocr_ray.sketches import cms_build, cms_query

    rng = np.random.default_rng(7)
    n_items = 2000
    counts = rng.integers(1, 100, n_items).astype(np.int64)
    h = hash64_strings([f"item{i}" for i in range(n_items)])
    # narrow sketch: estimates are upper bounds
    sk = cms_build(h, counts, width=256, depth=4)
    est = cms_query(sk, h)
    assert (est >= counts).all()
    # wide sketch: essentially no collisions -> exact
    skw = cms_build(h, counts, width=1 << 18, depth=4)
    assert (cms_query(skw, h) == counts).all()


def test_cms_merge_is_linear():
    from my_ocr_ray.sketches import cms_build

    h = hash64_strings([f"x{i}" for i in range(500)])
    counts = np.arange(1, 501, dtype=np.int64)
    whole = cms_build(h, counts, width=1024, depth=3)
    parts = sum(
        cms_build(h[i::4], counts[i::4], width=1024, depth=3) for i in range(4)
    )
    assert (whole == parts).all()


def test_cms_heavy_hitters_matches_exact_topk(ray_session):
    import ray.data

    from my_ocr_ray.corpus import ngram_topk
    from my_ocr_ray.sketches import cms_heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    phrases = [f"p{i} q{i} r{i}" for i in range(30)]  # zipf-ish heavy hitters
    texts = []
    for _ in range(600):
        words = rng.choice(vocab, rng.integers(5, 40)).tolist()
        for i in range(30):
            if rng.random() < 1.0 / (i + 2):
                words += phrases[i].split()
        texts.append(" ".join(words))
    t = pa.Table.from_pydict({"text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    exact = ngram_topk(ds, n=3, k=10).take_all()
    approx = cms_heavy_hitters(ds, n=3, k=10, width=1 << 16, depth=4).take_all()
    assert [r["ngram"] for r in approx] == [r["ngram"] for r in exact]
    assert [r["cnt_est"] for r in approx] == [r["cnt"] for r in exact]


# ---------------------------------------------------------------------------
# quantile-histogram sketch
# ---------------------------------------------------------------------------


def test_quantile_sketch_within_one_bin(ray_session):
    """Each estimate is the upper edge of the rank bin: exact discrete
    quantile <= estimate <= exact + bin width, per group, and n is the
    true group size."""
    import math

    import ray.data

    from my_ocr_ray.sketches import grouped_quantile_sketch

    rng = np.random.RandomState(7)
    groups = ["a"] * 4000 + ["b"] * 1000
    vals = np.concatenate(
        [rng.exponential(10.0, 4000), rng.normal(100.0, 5.0, 1000)]
    )
    t = pa.Table.from_pydict(
        {
            "event_type": pa.array(groups, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    bins = 4096
    out = grouped_quantile_sketch(
        ray.data.from_arrow(t).repartition(6),
        group_key="event_type", value_key="value",
        qs=(0.5, 0.9, 0.99), bins=bins,
    ).take_all()
    lo, hi = float(vals.min()), float(vals.max())
    w = (hi - lo) / bins
    by = {r["event_type"]: r for r in out}
    for g, gvals in (("a", vals[:4000]), ("b", vals[4000:])):
        assert by[g]["n"] == len(gvals)
        sv = np.sort(gvals)
        for q in (0.5, 0.9, 0.99):
            exact = sv[max(1, math.ceil(q * len(sv))) - 1]
            est = by[g][f"p{int(q * 100)}_est"]
            assert exact - 1e-6 <= est <= exact + w + 1e-6, (g, q, exact, est)
