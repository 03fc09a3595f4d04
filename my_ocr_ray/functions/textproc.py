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
#
# Hashing scheme (v2, vectorized AND SQL-checkable): one md5 per DISTINCT
# token (the only non-vectorizable step, amortized over the batch via
# np.unique), then pure int64 numpy arithmetic mod P = 2^31-1 for shingle
# composition, the seeded minhash family and LSH band keys.  Every step has
# an exact DuckDB formulation (md5 hex prefix -> BIGINT, literal constants)
# — see ``__ray_entry__.oracle_sql``, which builds its SQL from THESE
# constants.  Intermediate products stay < 2^62 (A < 2^29, h < 2^31,
# B < 2^20), so plain int64 arithmetic never overflows.
# ---------------------------------------------------------------------------

MOD_P = 2_147_483_647  # 2^31 - 1 (Mersenne)
SHINGLE_B = 1_000_003  # shingle/band polynomial base
# seeded affine family (odd multipliers < 2^29, offsets < 2^28), fixed
# deterministic literals shared with the SQL oracle builder
MINHASH_A = tuple(
    int(hashlib.md5(f"mh-a:{s}".encode()).hexdigest()[:7], 16) * 2 + 1
    for s in range(16)
)
MINHASH_C = tuple(
    int(hashlib.md5(f"mh-c:{s}".encode()).hexdigest()[:7], 16) for s in range(16)
)


def token_hash(token: str) -> int:
    """First 60 bits of md5, mod P.  SQL:
    ``CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647``."""
    return (
        int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big") >> 4
    ) % MOD_P


def shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles (space-joined) over the raw token stream; [] if < k."""
    toks = tokenize(text)
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_hashes(text: str, k: int = 3) -> list[int]:
    """Polynomial composition of token hashes per k-shingle; [0] if < k
    tokens (the sentinel keeps empty docs comparable)."""
    hs = [token_hash(t) for t in tokenize(text)]
    if len(hs) < k:
        return [0]
    out = []
    for i in range(len(hs) - k + 1):
        acc = hs[i]
        for j in range(1, k):
            acc = (acc * SHINGLE_B + hs[i + j]) % MOD_P
        out.append(acc)
    return out


def minhash_signature(text: str, num_hashes: int = 8, k: int = 3) -> list[int]:
    """Scalar reference implementation of the v2 MinHash signature:
    sig[s] = min over shingle hashes h of (A[s]*h + C[s]) % P.  The batch
    kernel (``dedup.minhash_signature_batch``) is the vectorized hot path;
    a parity test pins them equal."""
    shs = shingle_hashes(text, k)
    return [
        min((MINHASH_A[s] * h + MINHASH_C[s]) % MOD_P for h in shs)
        for s in range(num_hashes)
    ]


def lsh_band_keys(sig: list[int], band_size: int = 2) -> list[int]:
    """LSH band keys: polynomial fold of (band index, band slice) mod P."""
    out = []
    for b in range(len(sig) // band_size):
        acc = b
        for v in sig[b * band_size : (b + 1) * band_size]:
            acc = (acc * SHINGLE_B + v) % MOD_P
        out.append(acc)
    return out


def flat_token_hashes(texts: list[str], return_unique: bool = False):
    """Tokenize a batch and hash each token via the distinct-token cache.

    Returns (uint64 flat array of 64-bit md5 prefixes == hexdigest[:16],
    doc lengths) — or, with ``return_unique``, (unique hashes, inverse
    indices, doc lengths) so callers can do per-distinct-token work.  One
    md5 per DISTINCT token in the batch; everything else vectorized."""
    tok_lists = [TOKEN_RE.findall(t) for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [tok for toks in tok_lists for tok in toks]
    if not flat:
        empty = np.empty(0, dtype=np.uint64)
        if return_unique:
            return empty, np.empty(0, dtype=np.int64), lens
        return empty, lens
    arr = np.array(flat, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    if return_unique:
        return uh, inv, lens
    return uh[inv], lens


def minhash_sigs_matrix(
    texts: list[str], num_hashes: int = 8, k: int = 3
) -> np.ndarray:
    """Vectorized batch MinHash: (n_docs x num_hashes) int64 signature
    matrix, exactly equal to :func:`minhash_signature` per row."""
    h64, lens = flat_token_hashes(texts)
    h = ((h64 >> np.uint64(4)) % np.uint64(MOD_P)).astype(np.int64)
    n = len(lens)
    doc_idx = np.repeat(np.arange(n), lens)
    total = len(h)
    A = np.asarray(MINHASH_A[:num_hashes], dtype=np.int64)
    C = np.asarray(MINHASH_C[:num_hashes], dtype=np.int64)
    sig = np.empty((n, num_hashes), dtype=np.int64)
    sig[:] = C % MOD_P  # sentinel shingle hash 0 -> sig = C[s] % P
    if total >= k:
        m = total - k + 1
        acc = h[:m].copy()
        for j in range(1, k):
            acc = (acc * SHINGLE_B + h[j : m + j]) % MOD_P
        valid = doc_idx[:m] == doc_idx[k - 1 :]
        sh = acc[valid]
        sh_doc = doc_idx[:m][valid]
        if sh.size:
            counts = np.bincount(sh_doc, minlength=n)
            nonempty = counts > 0
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            ne_starts = starts[nonempty]
            for s in range(num_hashes):
                vals = (A[s] * sh + C[s]) % MOD_P
                sig[nonempty, s] = np.minimum.reduceat(vals, ne_starts)
    return sig


def lsh_band_matrix(sig: np.ndarray, band_size: int = 2) -> np.ndarray:
    """Vectorized band keys: (n_docs x n_bands) int64."""
    n_bands = sig.shape[1] // band_size
    out = np.empty((sig.shape[0], n_bands), dtype=np.int64)
    for b in range(n_bands):
        acc = np.full(sig.shape[0], b, dtype=np.int64)
        for v in range(band_size):
            acc = (acc * SHINGLE_B + sig[:, b * band_size + v]) % MOD_P
        out[:, b] = acc
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over tokens: per-token hash = first 16 hex chars of md5,
    bit votes +/-1, sign -> bit. Deterministic; SQL oracle mirrors the bit
    votes with unnest + bit_or (see ``__ray_entry__``)."""
    votes = np.zeros(64, dtype=np.int64)
    for tok in tokenize(text):
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits == 1, 1, -1)
    bits = (votes > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized batch SimHash (uint64 per doc), equal to
    :func:`simhash64` per row: distinct-token md5s expand to a flat
    (tokens x 64) bit matrix, per-doc votes via one ``add.reduceat``."""
    uh, inv, lens = flat_token_hashes(texts, return_unique=True)
    n = len(lens)
    out = np.zeros(n, dtype=np.uint64)
    if len(inv) == 0:
        return out
    # collapse to (doc, distinct-token, multiplicity) triples, then expand
    # bits only per distinct token — vote sums cost O(distinct pairs x 64)
    # instead of O(tokens x 64)
    doc_idx = np.repeat(np.arange(n), lens)
    key = doc_idx * len(uh) + inv
    ukey, cnt = np.unique(key, return_counts=True)
    d = (ukey // len(uh)).astype(np.int64)
    u = ukey % len(uh)
    bits_u = ((uh[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    contrib = cnt[:, None] * bits_u[u]
    starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    ones = np.zeros((n, 64), dtype=np.int64)
    ones[d[starts]] = np.add.reduceat(contrib, starts, axis=0)
    bit = (2 * ones) > lens[:, None]  # votes = 2*ones - count > 0
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bit.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    """Jaccard similarity of distinct k-word shingle sets, rounded to 6 dp."""
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return round_away_scalar(len(sa & sb) / u, 6) if u else 0.0


def containment_ngrams(a: str, b: str, k: int = 3) -> float:
    """Asymmetric containment ``|shingles(a) ∩ shingles(b)| / |shingles(a)|``
    (distinct k-word shingles, rounded to 6 dp) — near 1.0 when ``a`` is
    quoted/embedded inside ``b`` even if ``b`` is much longer, the case
    symmetric Jaccard under-scores. 0.0 when ``a`` has no shingles."""
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa:
        return 0.0
    return round_away_scalar(len(sa & sb) / len(sa), 6)


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


# Unicode whitespace class shared VERBATIM by the normalize_text kernel and
# its DuckDB oracle: RE2's \s stops at [\t\n\f\r ] while Arrow's
# utf8_trim_whitespace trims full Unicode whitespace, so the two engines
# disagree on edge characters like \x0b — an explicit literal class keeps
# both regex engines (both RE2) and both trims (space-only) identical.
WS_CHARS = (
    " \t\n\r\f\x0b\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
WS_CLASS_RE = "[" + WS_CHARS + "]+"
