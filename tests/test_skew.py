"""Skewed-document stress: one doc with thousands of spans must reassemble
correctly through every shuffle strategy (the salting rationale)."""
import pyarrow as pa
import pytest

from my_ocr_ray.pipelines.extract import extract
from my_ocr_ray.schema import DOCUMENTS_SCHEMA


def _skewed_corpus(n_small: int = 20, big_spans: int = 3000):
    rows = []
    big = [
        {"kind": "text", "text": f"content span number {i} with enough words here",
         "media_ref": "", "offset": i}
        for i in range(big_spans)
    ]
    rows.append({"doc_id": "big-doc", "spans": big})
    for d in range(n_small):
        rows.append(
            {
                "doc_id": f"small-{d:04d}",
                "spans": [
                    {"kind": "text", "text": "a few plain words in this span",
                     "media_ref": "", "offset": 0}
                ],
            }
        )
    return pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "spans": [r["spans"] for r in rows],
        },
        schema=DOCUMENTS_SCHEMA,
    )


@pytest.mark.parametrize("kwargs", [
    {"shuffle": "hash"},
    {"shuffle": "sort"},
    {"two_phase_salt": 8},
])
def test_skewed_doc_reassembles_in_order(ray_session, kwargs):
    import ray.data

    docs = _skewed_corpus()
    out = extract(
        ray.data.from_arrow(docs).repartition(4),
        media_lookup_ref=ray_session.put({}),
        **kwargs,
    ).take_all()
    by_id = {r["doc_id"]: r["spans"] for r in out}
    assert len(by_id) == 21
    big = by_id["big-doc"]
    assert len(big) == 3000
    offs = [s["offset"] for s in big]
    assert offs == sorted(offs) == list(range(3000))
    assert big[1234]["text"].startswith("content span number 1234")
