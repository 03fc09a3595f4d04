import pyarrow as pa

from my_ocr_ray.functions.textproc import (
    detect_language,
    is_boilerplate_span,
    jaccard_ngrams,
    link_density,
    lsh_band_keys,
    md5_fingerprint,
    minhash_signature,
    quality_metrics,
    shingles,
    simhash64,
    hamming64,
    token_count,
)
from my_ocr_ray.stages.textstage import boilerplate_mask


def test_link_density():
    assert link_density("[[ab]]") == 1.0
    assert link_density("no links here") == 0.0
    assert abs(link_density("[[abcd]] xx") - 8 / 11) < 1e-9


def test_boilerplate_rules():
    assert is_boilerplate_span("[[home]] [[about]] [[next]]")
    assert is_boilerplate_span("home login")  # < 3 tokens
    assert not is_boilerplate_span("plain sentence with several genuine words here")


def test_vectorized_mask_matches_scalar():
    samples = [
        "[[home]] [[about]] [[next]]",
        "home login",
        "plain sentence with several genuine words here",
        "",
        "x [[a]] y z w longer content words here too",
    ]
    mask = boilerplate_mask(pa.array(samples)).to_pylist()
    assert mask == [is_boilerplate_span(s) for s in samples]


def test_token_count():
    assert token_count("  a  b\tc\n") == 3
    assert token_count("") == 0


def test_md5_fingerprint_normalizes():
    assert md5_fingerprint("A  b\tC") == md5_fingerprint("a b c")
    assert md5_fingerprint("ab") != md5_fingerprint("ba")


def test_detect_language():
    assert detect_language("the cat is on the mat for fun") == "en"
    assert detect_language("der hund ist auf und mit den") == "de"
    assert detect_language("无线电通信是一种技术手段") == "zh"
    assert detect_language("qwerty zxcvb") == "und"


def test_quality_metrics():
    m = quality_metrics("the cat 42")
    assert m["n_chars"] == 10 and m["n_tokens"] == 3
    assert m["digit_ratio"] == 0.2
    assert m["stopword_ratio"] == round(1 / 3, 6)


def test_shingles_and_minhash():
    assert shingles("a b c d", 3) == ["a b c", "b c d"]
    s1 = minhash_signature("a b c d e f g h", num_hashes=8)
    s2 = minhash_signature("a b c d e f g h", num_hashes=8)
    assert s1 == s2 and len(s1) == 8
    # near-identical docs share most signature slots
    s3 = minhash_signature("a b c d e f g h x", num_hashes=8)
    assert sum(x == y for x, y in zip(s1, s3)) >= 4


def test_lsh_band_keys():
    sig = minhash_signature("a b c d e f", num_hashes=8)
    keys = lsh_band_keys(sig, band_size=2)
    assert len(keys) == 4 and len(set(keys)) >= 1


def test_simhash_similarity_property():
    a = simhash64("the quick brown fox jumps over the lazy dog again and again")
    b = simhash64("the quick brown fox jumps over the lazy dog again and once")
    c = simhash64("completely different words about streaming shuffle executors")
    assert hamming64(a, b) < hamming64(a, c)


def test_jaccard():
    assert jaccard_ngrams("a b c d", "a b c d") == 1.0
    assert jaccard_ngrams("a b c d", "x y z w") == 0.0


def test_containment_asymmetric():
    from my_ocr_ray.functions.textproc import containment_ngrams

    short = "a b c d"
    long = "x y z a b c d e f g h"
    # the short doc is fully quoted inside the long one
    assert containment_ngrams(short, long) == 1.0
    # but the long doc is mostly NOT in the short one (2 of 9 shingles)
    assert 0.0 < containment_ngrams(long, short) < 0.5
    # Jaccard under-scores the same pair (dilution by the long side)
    assert jaccard_ngrams(short, long) < containment_ngrams(short, long)
    # no shingles on the left -> 0.0 by definition
    assert containment_ngrams("a b", long) == 0.0
    assert containment_ngrams("a b c", "q r s") == 0.0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_masks_and_counts():
    import pyarrow as pa

    from my_ocr_ray.analysis import redact_pii_batch

    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "contact me at john.doe+spam@example.co.uk today",
                    "server at 192.168.001.1 and call +1 (555) 123-4567 now",
                    "no pii here at all",
                    "two mails a@b.io c@d.org and one phone 555-867-5309",
                ],
                pa.string(),
            ),
        }
    )
    out = redact_pii_batch(t).to_pylist()
    assert out[0]["text"] == "contact me at <EMAIL> today"
    assert out[0]["n_redactions"] == 1
    assert out[1]["text"] == "server at <IP> and call <PHONE> now"
    assert out[1]["n_redactions"] == 2
    assert out[2]["text"] == "no pii here at all"
    assert out[2]["n_redactions"] == 0
    assert out[3]["text"] == "two mails <EMAIL> <EMAIL> and one phone <PHONE>"
    assert out[3]["n_redactions"] == 3


def test_redact_pii_duckdb_parity_on_pii_laden_text():
    """Arrow RE2 kernels vs DuckDB RE2 on text where every rule fires —
    the sf oracle corpus has no PII, so engine parity is pinned here."""
    import duckdb
    import pyarrow as pa

    from my_ocr_ray.analysis import PII_RULES, redact_pii_batch

    texts = [
        "a@b.com then 10.0.0.1 then +44 20 7946 0958 end",
        "edge: trailing dot a@b.co. and 999.999.999.999 and 1234567890",
        "nested me@host.domain.org;192.0.2.255;(555) 000-1111",
        "",
    ]
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    mine = redact_pii_batch(t).to_pylist()

    con = duckdb.connect()
    con.register("documents", t)
    inner = "SELECT doc_id, text, CAST(0 AS BIGINT) AS n FROM documents"
    for pat, repl in PII_RULES:
        p = pat.replace("'", "''")
        inner = (
            "SELECT doc_id, regexp_replace(text, '" + p + "', '" + repl
            + "', 'g') AS text, n + len(regexp_extract_all(text, '" + p
            + "')) AS n FROM (" + inner + ")"
        )
    want = con.execute(
        "SELECT doc_id, text, n AS n_redactions FROM (" + inner + ") ORDER BY doc_id"
    ).fetchall()
    assert [(r["doc_id"], r["text"], r["n_redactions"]) for r in mine] == want


def test_per_row_sum_trailing_empty_rows():
    """Trailing zero-length rows must not steal the last element from the
    final non-empty row (reduceat clamp regression)."""
    import numpy as np

    from my_ocr_ray.analysis import _per_row_sum

    flags = np.array([1, 1, 1])
    offsets = np.array([0, 3, 3])  # row0 has 3 elements, row1 empty
    assert _per_row_sum(flags, offsets).tolist() == [3, 0]
    # interior empty row
    assert _per_row_sum(
        np.array([1, 2, 4]), np.array([0, 2, 2, 3])
    ).tolist() == [3, 0, 4]
    # all empty
    assert _per_row_sum(np.array([], dtype=np.int64),
                        np.array([0, 0, 0])).tolist() == [0, 0]


def test_compress_ratio_values():
    """Deterministic zlib ratios: repetitive text compresses far below
    high-entropy text; exact values pinned."""
    import zlib

    import pyarrow as pa

    from my_ocr_ray.analysis import compress_ratio_batch
    from my_ocr_ray.functions.num import round_away_scalar

    rep = "spam " * 200
    rnd = "q8Zk2 vX9pL mN3tY wB7cF jH4dG " * 6  # mixed-entropy
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([rep, rnd], pa.string()),
        }
    )
    out = compress_ratio_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    for did, txt in ((1, rep), (2, rnd)):
        c = len(zlib.compress(txt.encode(), 6))
        assert rows[did]["n_compressed"] == c
        assert rows[did]["compress_ratio"] == round_away_scalar(
            c / len(txt.encode()), 6
        )
    assert rows[1]["compress_ratio"] < rows[2]["compress_ratio"]
