import pyarrow as pa

from my_ocr_ray.functions.tokenizer import (
    CLS,
    PAD,
    SEP,
    UNK,
    SpanTokenizer,
    TokenizeClassifyStage,
    classify_tokens,
)


def test_encode_layout():
    tok = SpanTokenizer({"hello": 1000, "world": 1001}, max_len=8)
    ids, mask = tok.encode("hello world")
    assert ids == [CLS, 1000, 1001, SEP, PAD, PAD, PAD, PAD]
    assert mask == [1, 1, 1, 1, 0, 0, 0, 0]


def test_encode_oov_and_truncation():
    tok = SpanTokenizer({"a": 1000}, max_len=5)
    ids, _ = tok.encode("a b c d e f")
    assert ids == [CLS, 1000, UNK, UNK, SEP]  # truncated to max_len-2 tokens


def test_vocab_from_corpus_deterministic():
    t1 = SpanTokenizer.from_corpus(["b a", "c a"])
    t2 = SpanTokenizer.from_corpus(["c b", "a"])
    assert t1.vocab == t2.vocab == {"a": 1000, "b": 1001, "c": 1002}


def test_classify_tokens():
    assert classify_tokens("price 42 [[home]] ok") == ["WORD", "NUM", "LINK", "WORD"]


def test_stage_over_span_rows(ray_session):
    import ray.data

    vocab_ref = ray_session.put({"hello": 1000})
    ds = ray.data.from_items(
        [
            {"doc_id": "d", "offset": 0, "kind": "text", "text": "hello 42",
             "media_ref": ""},
            {"doc_id": "d", "offset": 1, "kind": "media", "text": "",
             "media_ref": "m1"},
        ]
    )
    out = ds.map_batches(
        TokenizeClassifyStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"vocab_ref": vocab_ref, "max_len": 6},
        concurrency=1,
    ).take_all()
    by_off = {r["offset"]: r for r in out}
    assert list(by_off[0]["token_ids"][:3]) == [CLS, 1000, UNK]
    assert list(by_off[0]["token_labels"]) == ["WORD", "NUM"]
    assert list(by_off[1]["token_ids"]) == []
