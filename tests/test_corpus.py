"""Semantic tests for the corpus family: n-gram machinery, top-k counts,
decontamination, repetition signals, TF-IDF, hash sampling. The oracles
prove Ray==SQL; these prove the operators do what they are FOR, on inputs
with known answers."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from my_ocr_ray.corpus import (
    decontaminate,
    flat_ngrams,
    flat_tokens,
    hash_sample,
    ngram_topk,
    repetition_batch,
    tfidf_scores,
)


def _docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


# ---------------------------------------------------------------------------
# n-gram machinery
# ---------------------------------------------------------------------------


def test_flat_tokens_matches_regex_split():
    texts = pa.array(["  a b   c ", "", "xy", "   ", "p  q"])
    flat, rows, n = flat_tokens(texts)
    assert n == 5
    assert flat.to_pylist() == ["a", "b", "c", "xy", "p", "q"]
    assert rows.tolist() == [0, 0, 0, 2, 4, 4]


def test_flat_ngrams_no_cross_doc():
    texts = pa.array(["a b c", "d e", "f"])
    grams, rows, _ = flat_ngrams(texts, 2)
    assert grams.to_pylist() == ["a b", "b c", "d e"]
    assert rows.tolist() == [0, 0, 1]
    # trigram: only doc 0 qualifies
    grams3, rows3, _ = flat_ngrams(texts, 3)
    assert grams3.to_pylist() == ["a b c"]
    assert rows3.tolist() == [0]


def test_flat_ngrams_empty_batch():
    grams, rows, n = flat_ngrams(pa.array([], pa.string()), 3)
    assert len(grams) == 0 and len(rows) == 0 and n == 0


# ---------------------------------------------------------------------------
# ngram_topk
# ---------------------------------------------------------------------------


def test_ngram_topk_counts(ray_session):
    import ray.data

    t = _docs_table(["a b c a b c", "a b x", "z z z"])
    out = ngram_topk(ray.data.from_arrow(t), n=2, k=3).take_all()
    # bigrams: "a b" x3 ("a b c a b c" has a-b twice? tokens a b c a b c ->
    # a-b, b-c, c-a, a-b, b-c -> a b:2, b c:2, c a:1; doc2 a-b:1; z z:2
    by = {(r["ngram"]): r["cnt"] for r in out}
    assert by["a b"] == 3
    assert set(by) == {"a b", "b c", "z z"}  # top-3 by (cnt desc, gram asc)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_overlap(ray_session):
    import ray.data

    ev_text = "one two three four five six seven"
    clean = "alpha beta gamma delta epsilon zeta eta"
    # doc 0 (0 % 97 == 0) is the eval doc; doc 1 copies a 5-gram window
    contaminated = "xx one two three four five yy"
    t = _docs_table([ev_text, contaminated, clean], ids=[0, 1, 2])
    out = decontaminate(ray.data.from_arrow(t), eval_mod=97, n=5).take_all()
    by = {r["doc_id"]: r for r in out}
    assert set(by) == {1, 2}  # eval doc excluded from output
    assert by[1]["contaminated"] and by[1]["n_overlap"] == 1
    assert not by[2]["contaminated"] and by[2]["n_overlap"] == 0


def test_decontaminate_counts_distinct(ray_session):
    import ray.data

    ev = "a b c d e f"  # grams: "a b c d e", "b c d e f"
    # repeats the same overlapping gram twice -> distinct count is 1
    doc = "a b c d e x a b c d e"
    t = _docs_table([ev, doc], ids=[0, 5])
    out = decontaminate(ray.data.from_arrow(t), eval_mod=97, n=5).take_all()
    assert out[0]["doc_id"] == 5 and out[0]["n_overlap"] == 1


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_known_fractions():
    # doc0: "a b a b a b": bigrams [a b, b a, a b, b a, a b] T=5 D=2 M=3
    # doc1: all distinct bigrams; doc2: single token -> T=0
    t = _docs_table(["a b a b a b", "p q r s", "solo"])
    out = repetition_batch(t, n=2)
    dup = out["dup_frac"].to_pylist()
    top = out["top_frac"].to_pylist()
    assert dup[0] == pytest.approx(3 / 5) and top[0] == pytest.approx(3 / 5)
    assert dup[1] == 0.0 and top[1] == pytest.approx(1 / 3)
    assert dup[2] == 0.0 and top[2] == 0.0


# ---------------------------------------------------------------------------
# tf-idf
# ---------------------------------------------------------------------------


def test_tfidf_rare_token_scores_higher(ray_session):
    import ray.data

    # "common" in every doc; "rare" in one
    texts = ["common common", "common rare", "common common common"]
    t = _docs_table(texts)
    out = tfidf_scores(ray.data.from_arrow(t), n_docs=3).take_all()
    by = {r["doc_id"]: r["mean_idf"] for r in out}
    idf_common = np.log(4.0 / 4.0)  # df=3 -> 0
    idf_rare = np.log(4.0 / 2.0)
    assert by[0] == pytest.approx(idf_common, abs=1e-6)
    assert by[1] == pytest.approx((idf_common + idf_rare) / 2, abs=1e-6)
    assert by[2] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# hash sampling
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_correct(ray_session):
    import ray.data

    n = 200
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
        }
    )
    out = hash_sample(ray.data.from_arrow(t), buckets=10, keep=3).take_all()
    kept = {r["doc_id"] for r in out}
    for i in range(n):
        b = (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big") >> 4
        ) % 10
        assert (i in kept) == (b < 3)
    # rough rate sanity: md5 is uniform
    assert 0.15 < len(kept) / n < 0.45


def test_sliding_window_fanout(ray_session):
    """Each event lands in exactly window/slide windows; counts sum to
    n_events * overlap."""
    import datetime as dt

    import ray.data

    from my_ocr_ray.windows import sliding_window

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(seconds=s), "a", 1.0) for s in (0, 1799, 1800, 5400)]
    t = pa.Table.from_pydict(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = sliding_window(
        ray.data.from_arrow(t), window_sec=3600, slide_sec=1800
    ).take_all()
    assert sum(r["n_events"] for r in out) == 4 * 2
    by = {r["window_start"]: r["n_events"] for r in out}
    e0 = int(base.timestamp())
    # events at 0 and 1799 fall in windows starting at e0-1800 and e0;
    # event at 1800 in e0 and e0+1800; event at 5400 in e0+3600, e0+5400
    assert by[e0 - 1800] == 2 and by[e0] == 3 and by[e0 + 1800] == 1


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------


def test_bloom_filter_no_false_negatives_and_low_fp():
    from my_ocr_ray.corpus import BloomFilter, _gram_hashes_u64

    members = [f"gram number {i} here now" for i in range(1000)]
    others = [f"different gram {i} over there" for i in range(10000)]
    bf = BloomFilter(len(members), bits_per_item=16, k=7)
    bf.add_many(_gram_hashes_u64(np.asarray(members, dtype=object)))
    assert bf.contains_many(
        _gram_hashes_u64(np.asarray(members, dtype=object))
    ).all()
    fp = bf.contains_many(_gram_hashes_u64(np.asarray(others, dtype=object))).mean()
    assert fp < 0.01, fp


def test_decontaminate_bloom_superset_of_exact(ray_session):
    """Bloom membership can only ADD hits (false positives), never lose
    one: every doc the exact operator flags must be flagged with at least
    the same overlap count, and the extra flags must stay rare."""
    import ray.data

    from my_ocr_ray.corpus import decontaminate, decontaminate_bloom

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, size=12).tolist()) for _ in range(300)
    ]
    t = _docs_table(texts)
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate(ray.data.from_arrow(t), eval_mod=97, n=5).take_all()
    }
    bloom = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate_bloom(
            ray.data.from_arrow(t), eval_mod=97, n=5, bits_per_item=64
        ).take_all()
    }
    assert set(exact) == set(bloom)
    extras = 0
    for d, n_ex in exact.items():
        assert bloom[d] >= n_ex, d  # no false negatives
        extras += bloom[d] - n_ex
    assert extras <= len(exact) * 0.05, extras


def test_shared_gram_fraction(ray_session):
    import ray.data

    from my_ocr_ray.corpus import shared_gram_fraction

    # docs 0 and 1 share the trigram "a b c"; doc 2 is unique
    t = _docs_table(["a b c d", "x a b c", "p q r s"])
    out = shared_gram_fraction(
        ray.data.from_arrow(t), n=3, min_df=2
    ).take_all()
    by = {r["doc_id"]: r["shared_frac"] for r in out}
    # doc0 grams: "a b c", "b c d" -> 1/2 shared; doc1: "x a b","a b c" -> 1/2
    assert by[0] == pytest.approx(0.5) and by[1] == pytest.approx(0.5)
    assert by[2] == 0.0


def test_weighted_hash_sample_rates(ray_session):
    import hashlib

    import ray.data

    from my_ocr_ray.sources.mixing import weighted_hash_sample

    n = 300
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        }
    )
    out = weighted_hash_sample(
        ray.data.from_arrow(t), "doc_id", "source",
        keep_buckets={"a": 2, "b": 8}, buckets=10,
    ).take_all()
    kept = {r["doc_id"] for r in out}
    for i in range(n):
        b = (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big") >> 4
        ) % 10
        quota = 2 if i % 2 else 8
        assert (i in kept) == (b < quota), i
    n_a = sum(1 for d in kept if d % 2)
    n_b = len(kept) - n_a
    assert n_b > n_a  # 8/10 source keeps more than 2/10 source


def test_bpe_token_count_mixed_content():
    from my_ocr_ray.analysis import bpe_token_count_batch

    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(['{"k": 69}', "hello world", ""]),
        }
    )
    out = bpe_token_count_batch(t)
    # '{"k": 69}' -> ['{"', 'k', '":', ' 69', '}'] = 5
    assert out["n_bpe"].to_pylist() == [5, 2, 0]


def test_curate_applies_every_filter(ray_session):
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.corpus import curate

    def words(prefix, n=40):
        return " ".join(f"{prefix}{i}" for i in range(n))

    rows = {
        0: (words("eval"), "en"),                 # eval slice (0%97==0) -> drop
        1: (words("keepa"), "en"),                # keep
        2: ("short text", "en"),                  # too short -> drop
        3: (words("german"), "de"),               # wrong lang -> drop
        4: (words("x") + " " + words("eval", 6), "en"),  # shares eval 5-gram -> drop
        5: (words("dup"), "en"),                  # keep: canonical of {5, 6}
        6: (words("dup"), "en"),                  # exact dup of 5 -> drop
    }
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array([v[0] for v in rows.values()], pa.string()),
            "lang": pa.array([v[1] for v in rows.values()], pa.string()),
        }
    )
    out = curate(ray.data.from_arrow(t).repartition(2)).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [1, 5]
    for r in out:
        assert r["n_tokens"] >= 30


# ---------------------------------------------------------------------------
# temperature mixing / stratified sampling / inverted index
# ---------------------------------------------------------------------------


def _h60(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big") >> 4


def test_mix_strata_flattens_skew(ray_session):
    """Rare strata pass through whole; the dominant stratum is cut to its
    temperature-flattened share; membership is the exact md5-threshold
    rule (deterministic across runs and block layouts)."""
    import ray.data

    from my_ocr_ray.corpus import mix_strata

    langs = ["en"] * 900 + ["de"] * 90 + ["fr"] * 10
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = mix_strata(ds, key="lang", alpha=0.5, target_ratio=0.5).take_all()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    # f_de and f_fr exceed 1 -> kept whole; f_en = 500*30/sw/900 ~ 0.391
    assert len(by["de"]) == 90 and len(by["fr"]) == 10
    sw = 900 ** 0.5 + 90 ** 0.5 + 10 ** 0.5
    f_en = 0.5 * 1000 * (900 ** 0.5) / sw / 900
    thr = int(np.floor(min(1.0, f_en) * 2.0 ** 60))
    expect_en = {i for i in range(900) if _h60(i) < thr}
    assert by["en"] == expect_en
    # independent re-run (different block layout) -> identical membership
    out2 = mix_strata(
        ray.data.from_arrow(t), key="lang", alpha=0.5, target_ratio=0.5
    ).take_all()
    assert {r["doc_id"] for r in out2} == {r["doc_id"] for r in out}


def test_stratified_sample_exact_quota(ray_session):
    """Exactly min(k, stratum size) rows per stratum, selected by smallest
    md5-hex draw; multi-block run equals single-block run."""
    import ray.data

    from my_ocr_ray.corpus import stratified_sample

    langs = ["en"] * 50 + ["de"] * 7 + ["fr"]
    ids = list(range(58))
    t = pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "lang": pa.array(langs, pa.string())}
    )
    out = stratified_sample(
        ray.data.from_arrow(t).repartition(5), key="lang", k=10
    ).take_all()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["en"]) == 10 and len(by["de"]) == 7 and by["fr"] == {57}
    # expected en selection: 10 smallest (md5 hex, id) draws
    en_ids = sorted(range(50), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert by["en"] == set(en_ids[:10])
    single = stratified_sample(ray.data.from_arrow(t), key="lang", k=10).take_all()
    assert {(r["lang"], r["doc_id"]) for r in single} == {
        (r["lang"], r["doc_id"]) for r in out
    }


def test_inverted_index_df_and_postings(ray_session):
    """df counts distinct docs per token; postings are the k smallest
    doc_ids ascending, merged exactly across blocks; min_df filters."""
    import ray.data

    from my_ocr_ray.corpus import inverted_index

    t = _docs_table(["a b c", "b c b", "c a", "b", "only once"], ids=[0, 1, 2, 3, 4])
    out = inverted_index(
        ray.data.from_arrow(t).repartition(3), k=5, min_df=2
    ).take_all()
    got = {r["token"]: (r["df"], r["postings"]) for r in out}
    assert got == {"a": (2, "0,2"), "b": (3, "0,1,3"), "c": (3, "0,1,2")}
    # k caps postings to globally smallest doc_ids even when blocks only
    # see their local candidates
    t2 = _docs_table(["t"] * 6, ids=[5, 0, 3, 1, 4, 2])
    out2 = inverted_index(
        ray.data.from_arrow(t2).repartition(3), k=2, min_df=2
    ).take_all()
    assert out2 == [{"token": "t", "df": 6, "postings": "0,1"}]
    # unbounded-vocabulary path: hash exchange on token gives the same
    # index as the coalesced combine
    hashed = inverted_index(
        ray.data.from_arrow(t).repartition(3), k=5, min_df=2, num_partitions=3
    ).take_all()
    assert {r["token"]: (r["df"], r["postings"]) for r in hashed} == got


def test_bigram_lm_hand_model(ray_session):
    """Model counts and smoothing verified by hand: bc={(a,b):3,(b,a):1,
    (x,y):1}, cu={a:3,b:1,x:1}, V=4; docs with <2 tokens drop out."""
    import math

    import ray.data

    from my_ocr_ray.corpus import bigram_lm_scores

    t = _docs_table(["a b a b", "a b", "x y", "solo"], ids=[0, 1, 2, 3])
    out = bigram_lm_scores(
        ray.data.from_arrow(t).repartition(3), k=0.5
    ).take_all()
    by = {r["doc_id"]: r for r in out}
    assert set(by) == {0, 1, 2}  # 1-token doc has no bigram
    lp_ab = math.log(3.5 / (3 + 0.5 * 4))
    lp_ba = math.log(1.5 / (1 + 0.5 * 4))
    lp_xy = math.log(1.5 / (1 + 0.5 * 4))
    assert by[0]["n_bigrams"] == 3
    assert abs(by[0]["avg_logp"] - (2 * lp_ab + lp_ba) / 3) < 1e-6
    assert abs(by[1]["avg_logp"] - lp_ab) < 1e-6
    assert abs(by[2]["avg_logp"] - lp_xy) < 1e-6
    # frequent transitions score higher than rare ones
    assert by[1]["avg_logp"] > by[2]["avg_logp"]


def test_hash_split_deterministic_and_stable(ray_session):
    """Split assignment agrees with hash_sample's buckets, is identical
    across runs/partitionings, and is stable under corpus growth (old
    doc_ids keep their split when new docs arrive)."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.corpus import hash_split

    t = pa.Table.from_pydict({"doc_id": pa.array(range(200), pa.int64())})
    out = hash_split(ray.data.from_arrow(t).repartition(4)).take_all()
    by = {r["doc_id"]: (r["bucket"], r["split"]) for r in out}
    assert len(by) == 200
    for b, s in by.values():
        assert s == ("train" if b < 8 else "val" if b < 9 else "test")
    # all three splits populated at n=200 with 8/1/1 buckets
    assert {s for _, s in by.values()} == {"train", "val", "test"}
    # different partitioning, same assignment
    out2 = hash_split(ray.data.from_arrow(t).repartition(7)).take_all()
    assert {r["doc_id"]: (r["bucket"], r["split"]) for r in out2} == by
    # growth stability: the 200-doc prefix of a 400-doc corpus is unchanged
    t2 = pa.Table.from_pydict({"doc_id": pa.array(range(400), pa.int64())})
    out3 = hash_split(ray.data.from_arrow(t2).repartition(4)).take_all()
    by3 = {r["doc_id"]: (r["bucket"], r["split"]) for r in out3}
    assert {k: v for k, v in by3.items() if k < 200} == by


def test_pmi_bigrams_hand_values(ray_session):
    """PMI verified by hand over bigram-event marginals; min_count drops
    singleton pairs; ranking sorts rounded pmi with (w1, w2) tie-breaks."""
    import math

    import ray.data

    from my_ocr_ray.corpus import pmi_bigrams

    # bigrams: (a,b)x3, (b,a)x2, (x,y)x3  -> n=8
    # cl: a=3, b=2, x=3 ; cr: b=3, a=2, y=3
    t = _docs_table(
        ["a b", "a b", "a b", "b a", "b a", "x y", "x y", "x y", "solo"],
        ids=list(range(9)),
    )
    out = pmi_bigrams(
        ray.data.from_arrow(t).repartition(3), k=10, min_count=2
    ).take_all()
    got = {(r["w1"], r["w2"]): (r["c"], r["pmi"]) for r in out}
    n = 8
    assert got[("a", "b")][0] == 3
    assert abs(got[("a", "b")][1] - round(math.log(3 * n / (3 * 3)), 6)) < 1e-9
    assert abs(got[("b", "a")][1] - round(math.log(2 * n / (2 * 2)), 6)) < 1e-9
    assert abs(got[("x", "y")][1] - round(math.log(3 * n / (3 * 3)), 6)) < 1e-9
    # exclusive pairs (x,y)/(b,a) outrank the diluted (a,b); rounded-pmi
    # tie between (a,b) and (x,y) broken by w1
    assert [(r["w1"], r["w2"]) for r in out] == [
        ("b", "a"), ("a", "b"), ("x", "y")
    ]
    # min_count prunes: raise threshold above every pair count
    none = pmi_bigrams(
        ray.data.from_arrow(t).repartition(3), k=10, min_count=4
    ).take_all()
    assert none == []


def test_seq_pack_greedy_boundaries(ray_session):
    """Packing restarts exactly when the budget would overflow; a
    document larger than the budget owns its sequence; groups pack
    independently even when split across input blocks."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.corpus import seq_pack

    rows = [
        # source a: tokens 3,3,3 with budget 7 -> seqs [0,0,1]
        ("a", 0, "x y z"), ("a", 1, "x y z"), ("a", 2, "x y z"),
        # source b: 9-token doc (> budget) alone, then 2+2 -> [0,1,1]
        ("b", 3, " ".join(["w"] * 9)), ("b", 4, "u v"), ("b", 5, "u v"),
    ]
    t = pa.Table.from_pydict(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = seq_pack(
        ray.data.from_arrow(t).repartition(3), budget=7
    ).take_all()
    got = {r["doc_id"]: (r["seq_idx"], r["n_tokens"]) for r in out}
    assert got == {
        0: (0, 3), 1: (0, 3), 2: (1, 3),
        3: (0, 9), 4: (1, 2), 5: (1, 2),
    }


def test_readability_flesch_hand_values():
    """Formula verified by hand on a simple sentence; garbled text scores
    lower than plain prose (pure-kernel test)."""
    import pyarrow as pa

    from my_ocr_ray.analysis import readability_batch

    plain = "The cat sat on the mat. The dog ran to the park."
    dense = "Antidisestablishmentarianism necessitates extraordinary comprehension capabilities."
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([plain, dense], pa.string()),
        }
    )
    out = {r["doc_id"]: r for r in readability_batch(t).to_pylist()}
    # plain: 12 words, 2 sentences, syllables = vowel groups
    assert out[0]["n_words"] == 12 and out[0]["n_sentences"] == 2
    exp = round(206.835 - 1.015 * (12 / 2)
                - 84.6 * (out[0]["n_syllables"] / 12), 6)
    assert abs(out[0]["flesch"] - exp) < 1e-9
    assert out[0]["flesch"] > out[1]["flesch"]


def test_gopher_rules_each_rule_fires():
    """Each rule rejects its targeted pathology and the clean doc passes
    (pure-kernel test: the batch function runs on a local Arrow table)."""
    import pyarrow as pa

    from my_ocr_ray.analysis import gopher_rules_batch

    good = "the cat sits on the mat " * 10           # 60 toks, stopwords, len ok
    short = "the cat sits on the mat"                # 6 toks < 50
    chars = "a b " * 30 + "the of"                   # mean_len ~1 < 3
    hashy = ("# # word " * 20 + "the of and is to in that for with on "
             ) .strip()                              # symbol ratio > 0.1
    bullets = "\n".join(["- item %d the of" % i for i in range(20)])  # >90% bullets
    ells = "\n".join(["the line %d trails off..." % i for i in range(20)])
    nostop = "alpha beta gamma delta " * 15          # 0 stopword hits
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "text": pa.array(
                [good, short, chars, hashy, bullets, ells, nostop], pa.string()
            ),
        }
    )
    out = gopher_rules_batch(t, min_tokens=50)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert got[0]["pass"] is True
    assert got[1]["pass"] is False and got[1]["n_tokens"] == 6
    assert got[2]["pass"] is False and got[2]["mean_len"] < 3
    assert got[3]["pass"] is False and got[3]["symbol_ratio"] > 0.1
    assert got[4]["pass"] is False and got[4]["bullet_ratio"] > 0.9
    assert got[5]["pass"] is False and got[5]["ellipsis_ratio"] > 0.3
    assert got[6]["pass"] is False and got[6]["n_stop"] == 0


def test_lang_confusion_matrix(ray_session):
    """Declared-vs-detected cells verified by hand, including a
    mislabelled doc and an undetectable one."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.analysis import lang_confusion

    rows = [
        ("en", "the cat and the dog"),          # en -> en
        ("en", "der hund und die katze ist"),   # en -> de (mislabelled)
        ("fr", "le chat et la mer est"),        # fr -> fr
        ("de", "xyz qqq zz"),                   # de -> und (no stopwords)
    ]
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = lang_confusion(ray.data.from_arrow(t).repartition(2)).take_all()
    got = {(r["lang"], r["lang_pred"]): r["n"] for r in out}
    assert got == {
        ("en", "en"): 1,
        ("en", "de"): 1,
        ("fr", "fr"): 1,
        ("de", "und"): 1,
    }


def test_oov_rate_against_topk_vocab(ray_session):
    """Vocab = exact global top-k with the (count desc, token asc)
    tie-break; OOV fractions verified by hand; empty docs score 0."""
    import ray.data

    from my_ocr_ray.analysis import oov_rate

    # counts: a=3, b=2, c=2, d=1 -> top-2 vocab = {a, b} (b beats c on text)
    t = _docs_table(["a a a", "b b c", "c d", ""], ids=[0, 1, 2, 3])
    out = oov_rate(
        ray.data.from_arrow(t).repartition(3), vocab_k=2
    ).take_all()
    by = {r["doc_id"]: (r["n_tokens"], r["oov"]) for r in out}
    assert by == {
        0: (3, 0.0),
        1: (3, round(1 / 3, 6)),
        2: (2, 1.0),
        3: (0, 0.0),
    }


def test_source_divergence_hand_kl(ray_session):
    """KL verified by hand over a two-source mixture; a source whose
    distribution equals the global mixture scores exactly 0."""
    import math

    import pyarrow as pa
    import ray.data

    from my_ocr_ray.analysis import source_divergence

    def tbl(rows):
        return pa.Table.from_pydict(
            {
                "source": pa.array([s for s, _ in rows], pa.string()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )

    # source a: x:2 y:1 ; source b: x:1 y:2 ; global: x:3 y:3
    t = tbl([("a", "x x y"), ("b", "x y y")])
    out = source_divergence(ray.data.from_arrow(t).repartition(2)).take_all()
    by = {r["source"]: r for r in out}
    expect = round((2 / 3) * math.log((2 / 3) / 0.5)
                   + (1 / 3) * math.log((1 / 3) / 0.5), 6)
    assert by["a"]["n_tokens"] == 3 and by["b"]["n_tokens"] == 3
    assert abs(by["a"]["kl"] - expect) < 1e-9
    assert abs(by["b"]["kl"] - expect) < 1e-9  # symmetric mixture
    # single source == global mixture -> kl is exactly 0
    solo = source_divergence(
        ray.data.from_arrow(tbl([("a", "x x y"), ("a", "z")])).repartition(2)
    ).take_all()
    assert solo == [{"source": "a", "n_tokens": 4, "kl": 0.0}]


def test_length_outliers_flags_extremes(ray_session):
    """Only strata with >= 2 rows participate, and exactly the injected
    extreme value is flagged."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.analysis import length_outliers

    n = [100, 101, 99, 100, 1000]          # en: one huge outlier
    langs = ["en"] * 5 + ["fr"]            # fr: single row -> no stddev
    n.append(5)
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(n, pa.int64()),
        }
    )
    out = length_outliers(
        ray.data.from_arrow(t).repartition(2), key="lang", col="n_chars", z=1.5
    ).take_all()
    assert {r["doc_id"] for r in out} == {4}


def test_epoch_shuffle_matches_bruteforce_and_is_layout_invariant(ray_session):
    """Ranks are the md5-order permutation regardless of partitioning, and
    a different seed yields a different permutation."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from my_ocr_ray.corpus import epoch_shuffle

    ids = list(range(100))
    t = pa.Table.from_pydict({"doc_id": pa.array(ids, pa.int64())})
    expect = {
        d: r
        for r, d in enumerate(
            sorted(ids, key=lambda i: (hashlib.md5(f"13:{i}".encode()).hexdigest(), i))
        )
    }
    for nparts in (1, 7):
        out = epoch_shuffle(
            ray.data.from_arrow(t).repartition(nparts), seed=13
        ).take_all()
        got = {r["doc_id"]: r["shuffle_rank"] for r in out}
        assert got == expect
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in epoch_shuffle(ray.data.from_arrow(t), seed=14).take_all()
    }
    assert sorted(other.values()) == list(range(100))
    assert other != expect


def test_chunk_windows_edges(ray_session):
    """Empty doc -> no chunks; short doc -> one truncated chunk; 7 tokens at
    window=3/stride=2 -> starts 0,2,4,6 with the tail truncated."""
    import pyarrow as pa
    import ray.data

    from my_ocr_ray.corpus import chunk_windows

    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e f g", "", "x y"], pa.string()),
        }
    )
    out = chunk_windows(
        ray.data.from_arrow(t).repartition(2), window=3, stride=2
    ).take_all()
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in out
    )
    assert got == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "c d e"),
        (1, 2, 3, "e f g"),
        (1, 3, 1, "g"),
        (3, 0, 2, "x y"),
    ]


def test_capped_vocab_broadcasts_are_bounded(ray_session):
    """Round-3 (VERDICT r2 item 2): the tfidf DF broadcast and the bigram
    vocabulary are hard-capped — the shipped table never exceeds the cap
    no matter the corpus vocabulary."""
    import ray

    from my_ocr_ray.corpus import (
        bigram_lm_scores,
        capped_document_frequencies,
        tfidf_scores,
        top_token_vocab,
    )

    # 200 distinct tokens across 20 docs
    texts = [" ".join(f"tok{i}_{j}" for j in range(10)) for i in range(20)]
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    df_tbl = capped_document_frequencies(ds, vocab_cap=7)
    assert df_tbl.num_rows == 7
    vocab = top_token_vocab(ds, vocab_cap=5)
    assert len(vocab) == 5

    # capped scoring still produces one row per doc, OOV handled
    out = tfidf_scores(ds, n_docs=20, vocab_cap=7).take_all()
    assert len(out) == 20
    out2 = bigram_lm_scores(ds, vocab_cap=5).take_all()
    assert len(out2) == 20  # every doc has >= 2 tokens


def test_capped_equals_uncapped_when_cap_not_binding(ray_session):
    import ray

    from my_ocr_ray.corpus import bigram_lm_scores, tfidf_scores

    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "a a d", "b c"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    a = sorted((r["doc_id"], r["mean_idf"]) for r in
               tfidf_scores(ds, n_docs=3, vocab_cap=1000).take_all())
    b = sorted((r["doc_id"], r["mean_idf"]) for r in
               tfidf_scores(ds, n_docs=3, vocab_cap=4).take_all())
    assert a == b  # 4 distinct tokens -> cap of 4 not binding
    la = sorted((r["doc_id"], r["avg_logp"]) for r in
                bigram_lm_scores(ds, vocab_cap=1000).take_all())
    lb = sorted((r["doc_id"], r["avg_logp"]) for r in
                bigram_lm_scores(ds, vocab_cap=4).take_all())
    assert la == lb
    # vocab_cap=None = the uncapped FAST path (no vocab pass, no remap):
    # value-identical to any non-binding cap
    ln = sorted((r["doc_id"], r["avg_logp"]) for r in
                bigram_lm_scores(ds, vocab_cap=None).take_all())
    assert ln == la
