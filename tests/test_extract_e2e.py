"""End-to-end golden check: per-row span-sequence equality (kind, text,
media_ref, order) over the deterministic synthetic corpus — the correctness
contract from BASELINE.json, across all three pipeline configurations."""
import pytest

from my_ocr_ray.pipelines.extract import extract
from my_ocr_ray.synth import corpus_tables


@pytest.fixture(scope="module")
def corpus():
    return corpus_tables(40, seed=11)


def _expected_map(expected):
    return {r["doc_id"]: r["spans"] for r in expected.to_pylist()}


def _got_map(rows):
    return {r["doc_id"]: [dict(s) for s in r["spans"]] for r in rows}


def _run(ray_session, corpus, **kwargs):
    import ray.data

    docs, media, expected = corpus
    docs_ds = ray.data.from_arrow(docs).repartition(4)
    if "media_ds" in kwargs:
        kwargs["media_ds"] = ray.data.from_arrow(media)
    else:
        kwargs["media_lookup_ref"] = ray_session.put(
            dict(zip(media["media_ref"].to_pylist(), media["bytes"].to_pylist()))
        )
    out = extract(docs_ds, **kwargs).take_all()  # auto-sized concurrency
    assert _got_map(out) == _expected_map(expected)


def test_one_phase(ray_session, corpus):
    _run(ray_session, corpus)


def test_two_phase_salted(ray_session, corpus):
    _run(ray_session, corpus, two_phase_salt=4)


def test_media_shuffle_join(ray_session, corpus):
    _run(ray_session, corpus, media_ds=True, join_num_partitions=4)
