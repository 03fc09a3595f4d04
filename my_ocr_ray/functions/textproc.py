"""Text kernels: tokenize, boilerplate scoring, language-ID, quality, dedup hashes.

The extraction-side analogs of the reference's text handling
(``mmocr/datasets/pipelines/ner_transforms.py:8-41`` tokenize+classify,
``mmocr/core/evaluation/ocr_metric.py:49-59`` normalizers) plus the
training-data-pipeline kernels (fingerprints, MinHash, SimHash, quality,
language-ID) that the reference lacks.

Design constraint: every kernel that backs a ``queries()`` entry has an
*exactly equivalent* ANSI-SQL formulation (DuckDB) for the correctness
oracle — hence md5-based hashing (DuckDB ``md5`` == hashlib md5 hexdigest),
``\\S+`` tokenization, and explicit rounding on float outputs.
"""
from __future__ import annotations

import hashlib
import re

from .num import round_away_scalar

import numpy as np

TOKEN_RE = re.compile(r"\S+")
LINK_RE = re.compile(r"\[\[[^\]]*\]\]")
ALPHA_RE = re.compile(r"[A-Za-z]")
DIGIT_RE = re.compile(r"[0-9]")
CJK_RE = re.compile(r"[一-鿿]")

# Tiny per-language stopword lists (public common-word sets). Deterministic,
# duplicated verbatim in the SQL oracles.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "de", "est", "pour", "dans", "que", "une"),
    "es": ("el", "la", "los", "las", "de", "que", "es", "en", "por", "con"),
}
LANG_ORDER = ("en", "de", "fr", "es")


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


def normalize_ws(text: str) -> str:
    """Collapse whitespace + strip (SQL: trim(regexp_replace(text,'\\s+',' ','g')))."""
    return " ".join(text.split())


def md5_fingerprint(text: str) -> str:
    """md5 hex digest of the lowercased whitespace-normalized text."""
    return hashlib.md5(normalize_ws(text).lower().encode("utf-8")).hexdigest()


def token_count(text: str) -> int:
    return len(tokenize(text))


def link_density(text: str) -> float:
    """Chars inside ``[[...]]`` link markers / total chars (0 if empty)."""
    n = len(text)
    if n == 0:
        return 0.0
    link = sum(len(m) for m in LINK_RE.findall(text))
    return link / n


def is_boilerplate_span(text: str) -> bool:
    """Boilerplate test for a text span: link-dense or degenerate-short.

    The CETD/Readability-style rule (link density + content length); the
    reference has no analog (HTML stripping is new scope per the target).
    """
    return link_density(text) > 0.4 or token_count(text) < 3


def lang_scores(text: str) -> dict[str, int]:
    toks = [t.lower() for t in tokenize(text)]
    return {lang: sum(t in STOPWORDS[lang] for t in toks) for lang in LANG_ORDER}


def detect_language(text: str) -> str:
    """Stopword-count + CJK-ratio heuristic; deterministic tie-break by
    LANG_ORDER. Returns 'zh' if >20% CJK chars, 'und' if no signal."""
    n = len(text)
    if n and len(CJK_RE.findall(text)) > 0.2 * n:
        return "zh"
    scores = lang_scores(text)
    best = max(scores.values(), default=0)
    if best == 0:
        return "und"
    for lang in LANG_ORDER:
        if scores[lang] == best:
            return lang
    return "und"


def quality_metrics(text: str) -> dict:
    """Quality-scoring features, all floats rounded to 6 dp for oracle parity."""
    n = len(text)
    toks = tokenize(text)
    nt = len(toks)
    alpha = len(ALPHA_RE.findall(text))
    digit = len(DIGIT_RE.findall(text))
    sw = sum(t.lower() in STOPWORDS["en"] for t in toks)
    return {
        "n_chars": n,
        "n_tokens": nt,
        "mean_token_len": round_away_scalar(sum(len(t) for t in toks) / nt, 6) if nt else 0.0,
        "alpha_ratio": round_away_scalar(alpha / n, 6) if n else 0.0,
        "digit_ratio": round_away_scalar(digit / n, 6) if n else 0.0,
        "stopword_ratio": round_away_scalar(sw / nt, 6) if nt else 0.0,
    }


# ---------------------------------------------------------------------------
# Shingling / MinHash / SimHash / Jaccard
# ---------------------------------------------------------------------------


def shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles (space-joined) over the raw token stream; [] if < k."""
    toks = tokenize(text)
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature(text: str, num_hashes: int = 8, k: int = 3) -> list[str]:
    """MinHash signature as hex-string minima: sig[s] = min over shingles of
    md5(f"{s}:{shingle}"). String-lexicographic min == DuckDB list_min, making
    the signature SQL-checkable. Empty-shingle docs get the md5 of f"{s}:"."""
    shs = shingles(text, k) or [""]
    return [
        min(hashlib.md5(f"{s}:{sh}".encode("utf-8")).hexdigest() for sh in shs)
        for s in range(num_hashes)
    ]


def lsh_band_keys(sig: list[str], band_size: int = 2) -> list[str]:
    """LSH band keys: md5 of 'band_index|joined band slice'."""
    return [
        hashlib.md5(
            (f"{b}|" + "|".join(sig[b * band_size : (b + 1) * band_size])).encode()
        ).hexdigest()
        for b in range(len(sig) // band_size)
    ]


def simhash64(text: str) -> int:
    """64-bit SimHash over tokens: per-token hash = first 16 hex chars of md5,
    bit votes +/-1, sign -> bit. Deterministic; no SQL oracle (bit ops)."""
    votes = np.zeros(64, dtype=np.int64)
    for tok in tokenize(text):
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits == 1, 1, -1)
    bits = (votes > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    """Jaccard similarity of distinct k-word shingle sets, rounded to 6 dp."""
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return round_away_scalar(len(sa & sb) / u, 6) if u else 0.0


def string_strip(text: str, strip: bool = True, strip_pos: str = "both",
                 strip_str: str | None = None) -> str:
    """``StringStrip`` semantics (``mmocr/utils/string_util.py:1-35``)."""
    if not strip:
        return text
    if strip_pos == "left":
        return text.lstrip(strip_str)
    if strip_pos == "right":
        return text.rstrip(strip_str)
    return text.strip(strip_str)


def is_chinese_char(ch: str) -> bool:
    """CJK-range predicate (``data_generation_tools.py:110-117``)."""
    return bool(CJK_RE.match(ch))
