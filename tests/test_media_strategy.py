"""Auto-selection seams added for the 100-TB story: the broadcast-vs-join
media strategy switch (``extract(media_path=...)``) and the sampled
auto-salt trigger (``two_phase_salt="auto"``) — both must pick the right
path from the DATA, and both paths must stay golden-equal."""
import os

import pytest

from my_ocr_ray.pipelines.extract import (
    MEDIA_BROADCAST_FRACTION,
    choose_media_strategy,
    estimate_parquet_bytes,
    extract,
    _auto_salt,
)
from my_ocr_ray.synth import corpus_tables


@pytest.fixture(scope="module")
def corpus():
    return corpus_tables(30, seed=23)


def test_choose_media_strategy_thresholds():
    store = 1_000_000
    assert choose_media_strategy(1, store) == "broadcast"
    at_budget = int(MEDIA_BROADCAST_FRACTION * store)
    assert choose_media_strategy(at_budget, store) == "broadcast"
    assert choose_media_strategy(at_budget + 1, store) == "join"
    # unknown sizes must take the scale-safe path
    assert choose_media_strategy(None, store) == "join"
    assert choose_media_strategy(123, None) == "join"


def test_estimate_parquet_bytes(tmp_path, corpus):
    import pyarrow.parquet as pq

    _, media, _ = corpus
    p = tmp_path / "media.parquet"
    pq.write_table(media, p)
    est = estimate_parquet_bytes(str(p))
    # footer-only estimate approximates the uncompressed table bytes
    assert est is not None and est > media.num_rows
    # directory form resolves *.parquet
    assert estimate_parquet_bytes(str(tmp_path)) == est
    assert estimate_parquet_bytes([str(p), str(p)]) == 2 * est
    assert estimate_parquet_bytes("/nonexistent/x.parquet") is None


def _expected_map(expected):
    return {r["doc_id"]: r["spans"] for r in expected.to_pylist()}


def _got_map(rows):
    return {r["doc_id"]: [dict(s) for s in r["spans"]] for r in rows}


def test_media_path_auto_selects_and_stays_golden(
    ray_session, corpus, tmp_path, monkeypatch
):
    """extract(media_path=...) picks broadcast for a small table, join when
    the table exceeds the object-store budget — goldens identical on both."""
    import pyarrow.parquet as pq
    import ray.data

    import my_ocr_ray.pipelines.extract as ex

    docs, media, expected = corpus
    p = tmp_path / "media.parquet"
    pq.write_table(media, p)

    chosen = []
    orig = ex.choose_media_strategy

    def spy(media_bytes, store_bytes, broadcast_fraction=MEDIA_BROADCAST_FRACTION):
        s = orig(media_bytes, store_bytes, broadcast_fraction)
        chosen.append(s)
        return s

    monkeypatch.setattr(ex, "choose_media_strategy", spy)

    out_small = extract(
        ray.data.from_arrow(docs).repartition(4), media_path=str(p)
    ).take_all()
    assert chosen[-1] == "broadcast"
    assert _got_map(out_small) == _expected_map(expected)

    # force the join branch by shrinking the apparent store budget
    monkeypatch.setattr(
        ex, "estimate_parquet_bytes", lambda paths: 10**15
    )
    out_big = extract(
        ray.data.from_arrow(docs).repartition(4),
        media_path=str(p),
        join_num_partitions=4,
    ).take_all()
    assert chosen[-1] == "join"
    assert _got_map(out_big) == _expected_map(expected)


def test_media_path_exclusive_with_explicit_strategy(corpus, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    docs, media, _ = corpus
    p = tmp_path / "media.parquet"
    pq.write_table(media, p)
    with pytest.raises(ValueError, match="media_path OR"):
        extract(
            ray.data.from_arrow(docs),
            media_ds=ray.data.from_arrow(media),
            media_path=str(p),
        )


def test_auto_salt_decision(ray_session, corpus):
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.schema import DOCUMENTS_SCHEMA

    docs, _, _ = corpus
    # bounded span counts: stays on the single-phase path
    assert _auto_salt(ray.data.from_arrow(docs)) is None
    spans = [
        {"kind": "text", "text": f"w{k}", "media_ref": "", "offset": k}
        for k in range(500)
    ]
    hot = pa.Table.from_pydict(
        {"doc_id": ["doc-hot"], "spans": [spans]}, schema=DOCUMENTS_SCHEMA
    )
    n_salt = _auto_salt(ray.data.from_arrow(hot), row_budget=100)
    # 500 spans * safety 4 / budget 100 = 20 salt buckets
    assert n_salt == 20


def test_pathological_doc_takes_salted_path_automatically(
    ray_session, corpus, monkeypatch
):
    """A hot document above the row budget must route through the salted
    two-phase reassembly WITHOUT the caller passing a flag, and the output
    must equal the single-phase result."""
    import pyarrow as pa
    import ray.data

    import my_ocr_ray.pipelines.extract as ex
    from my_ocr_ray.schema import DOCUMENTS_SCHEMA

    docs, media, expected = corpus
    spans = [
        {"kind": "text", "text": f"word{k} tail keep", "media_ref": "", "offset": k}
        for k in range(400)
    ]
    hot = pa.Table.from_pydict(
        {"doc_id": ["doc-hot"], "spans": [spans]}, schema=DOCUMENTS_SCHEMA
    )
    docs_all = pa.concat_tables(
        [docs.select(["doc_id", "spans"]), hot]
    ).combine_chunks()

    taken = {}
    orig = ex.reassemble_two_phase

    def spy(*a, **kw):
        taken["salted"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ex, "reassemble_two_phase", spy)
    lookup = ray_session.put(
        dict(zip(media["media_ref"].to_pylist(), media["bytes"].to_pylist()))
    )
    out = extract(
        ray.data.from_arrow(docs_all).repartition(4),
        media_lookup_ref=lookup,
        salt_row_budget=200,
    ).take_all()
    assert taken.get("salted"), "auto trigger did not choose the salted path"
    got = _got_map(out)
    exp = _expected_map(expected)
    assert {k: v for k, v in got.items() if k != "doc-hot"} == exp
    hot_spans = got["doc-hot"]
    assert [s["offset"] for s in hot_spans] == list(range(400))
    assert hot_spans[7]["text"] == "word7 tail keep"
