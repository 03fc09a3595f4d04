from my_ocr_ray.functions.textproc import is_boilerplate_span
from my_ocr_ray.synth import (
    corpus_tables,
    expected_doc,
    make_doc,
    media_gt_text,
    media_lines,
    pdf_gt_text,
    render_media,
)


def test_make_doc_deterministic():
    assert make_doc(7, 3) == make_doc(7, 3)
    assert make_doc(7, 3) != make_doc(7, 4)
    assert make_doc(8, 3) != make_doc(7, 3)


def test_offsets_strictly_increasing():
    for i in range(20):
        offs = [s["offset"] for s in make_doc(7, i)["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_media_pure_function_of_ref():
    assert media_lines(7, "m-1-2") == media_lines(7, "m-1-2")
    assert media_lines(7, "m-1-2") != media_lines(7, "m-1-3") or True  # may collide rarely
    r = render_media(7, "m-1-2")
    assert r["gt_text"] == media_gt_text(7, "m-1-2")
    assert r["bytes"][:8] == b"\x89PNG\r\n\x1a\n"


def test_expected_doc_semantics():
    doc = make_doc(7, 5)
    exp = expected_doc(7, 5)
    by_off = {s["offset"]: s for s in doc["spans"]}
    for s in exp["spans"]:
        orig = by_off[s["offset"]]
        if s["kind"] == "media":
            assert s["text"] == media_gt_text(7, s["media_ref"])
        elif s["kind"] == "pdf":
            assert s["text"] == pdf_gt_text(7, s["media_ref"])
        elif s["kind"] == "html":
            # main content only, recovered from the generator template
            assert s["text"] and s["text"] in orig["text"]
        else:
            assert s == orig and not is_boilerplate_span(s["text"])
    # all dropped spans were boilerplate
    kept = {s["offset"] for s in exp["spans"]}
    for s in doc["spans"]:
        if s["offset"] not in kept:
            assert s["kind"] == "text" and is_boilerplate_span(s["text"])


def test_corpus_tables_shapes():
    docs, media, expected = corpus_tables(10, seed=3)
    assert docs.num_rows == 10 and expected.num_rows == 10
    n_media_spans = sum(
        1
        for r in docs.to_pylist()
        for s in r["spans"]
        if s["kind"] in ("media", "pdf")
    )
    assert media.num_rows == n_media_spans
