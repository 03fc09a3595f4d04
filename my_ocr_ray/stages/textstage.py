"""Boilerplate classification over text-span rows — pure Arrow compute.

Vectorized CETD/Readability-style rule (no per-row Python in the hot path):
link density from ``[[...]]`` marker chars (computed by regex-removal length
delta) and token count from ``\\S+`` matches. Matches
``functions.textproc.is_boilerplate_span`` exactly (unit-tested equivalence).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

LINK_PATTERN = r"\[\[[^\]]*\]\]"
LINK_DENSITY_THR = 0.4
MIN_TOKENS = 3


def boilerplate_mask(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Boolean mask: True where the span is boilerplate."""
    total = pc.utf8_length(text)
    delinked = pc.replace_substring_regex(text, LINK_PATTERN, "")
    link_chars = pc.subtract(total, pc.utf8_length(delinked))
    safe_total = pc.max_element_wise(total, 1)
    link_density = pc.divide(
        pc.cast(link_chars, pa.float64()), pc.cast(safe_total, pa.float64())
    )
    n_tokens = pc.count_substring_regex(text, r"\S+")
    return pc.or_(
        pc.greater(link_density, LINK_DENSITY_THR), pc.less(n_tokens, MIN_TOKENS)
    )


def strip_boilerplate(batch: pa.Table) -> pa.Table:
    """Drop boilerplate text spans; raw-HTML spans are reduced to their
    main content (CETD text/link-density extractor, ``functions/html.py``)
    in place; media spans pass through untouched.

    HTML parsing is inherently per-document (stdlib ``HTMLParser``), so only
    the ``kind == "html"`` rows leave the vectorized path."""
    is_text = pc.equal(batch["kind"], "text")
    boiler = boilerplate_mask(batch["text"])
    drop = pc.and_(is_text, boiler)
    out = batch.filter(pc.invert(drop))
    html_mask = pc.equal(out["kind"], "html")
    if pc.any(html_mask).as_py():
        from ..functions.html import extract_main_html

        mask = html_mask.combine_chunks().to_numpy(zero_copy_only=False)
        texts = out["text"].to_pylist()
        for i in mask.nonzero()[0]:
            texts[i] = extract_main_html(texts[i])
        out = out.set_column(
            out.column_names.index("text"), "text", pa.array(texts, pa.string())
        )
    return out
