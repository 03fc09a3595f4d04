"""Fixed Arrow schemas for the engine's logical tables.

The reference's schema is dynamic/convention-based (``results`` dicts,
``mmocr/datasets/base_dataset.py:85-102``); here every logical table has ONE
declared ``pyarrow.Schema`` — schema drift is a bug, not a feature
(SURVEY.md §1.6). The interleaved-document shape matches BASELINE.json
``input_hint`` exactly.
"""
from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "html" | "pdf" | "media"
        ("text", pa.string()),       # raw text/HTML for text spans; "" for media/pdf input
        ("media_ref", pa.string()),  # media-table key for media/pdf spans; "" for text
        ("offset", pa.int32()),      # strictly increasing per doc — defines order
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Exploded span rows (one row per span; the unit of work between the route
# explode and the reassembly shuffle).
SPAN_ROWS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("bytes", pa.large_binary()),  # PNG-encoded rendered text image
        ("gt_text", pa.string()),      # exact rendered string (golden)
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_lines", pa.int32()),
    ]
)

EXTRACTED_SCHEMA = DOCUMENTS_SCHEMA  # output mirrors the input shape
