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
