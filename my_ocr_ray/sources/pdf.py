"""PDF layout-parsing source — Ray-side plumbing with a stubbed decoder.

The target scope includes PDF layout parsing; this container has no PDF
library, so the binary decode step is STUBBED (``NotImplementedError``)
behind a real, tested Ray pipeline: schema, batch shapes, the actor-pool
stage signature and the output layout are all real, and a deterministic fake
decoder (``FakePdfDecoder``) drives the tests. Swapping in a real decoder
(pdfium/poppler) is a one-class change.

Output rows mirror the span model: one row per layout block, ordered by
:func:`my_ocr_ray.functions.geometry.layout_reading_order` (column-aware
reading order).
"""
from __future__ import annotations

import pyarrow as pa

from ..functions.geometry import layout_reading_order

PDF_BLOCK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page", pa.int32()),
        ("order", pa.int32()),        # reading-order index within the page
        ("kind", pa.string()),        # "text" | "image"
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float32())),  # [x0, y0, x1, y1] page coords
    ]
)


class PdfDecoder:
    """Real decoder seam: bytes -> list of pages, each a list of blocks
    ``{"kind", "text", "bbox"}``. Not available in this sandbox."""

    def decode(self, data: bytes) -> list[list[dict]]:
        raise NotImplementedError(
            "no PDF library in this environment; plug a pdfium/poppler "
            "decoder here (see FakePdfDecoder for the contract)"
        )


class FakePdfDecoder(PdfDecoder):
    """Deterministic fake for tests: 'pdf' bytes are a JSON page list."""

    def decode(self, data: bytes) -> list[list[dict]]:
        import json

        return json.loads(data.decode("utf-8"))


class PdfLayoutStage:
    """Actor-pool stage: (doc_id, bytes) -> ordered layout-block rows.

    Use with ``map_batches(PdfLayoutStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` — decoder state loads once per actor.
    """

    def __init__(self, decoder: PdfDecoder | None = None):
        self.decoder = decoder or PdfDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in PDF_BLOCK_SCHEMA}
        for doc_id, data in zip(
            batch["doc_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            pages = self.decoder.decode(data)
            for pg, blocks in enumerate(pages):
                quads = [
                    [b["bbox"][0], b["bbox"][1], b["bbox"][2], b["bbox"][1],
                     b["bbox"][2], b["bbox"][3], b["bbox"][0], b["bbox"][3]]
                    for b in blocks
                ]
                for order, bi in enumerate(layout_reading_order(quads)):
                    b = blocks[bi]
                    rows["doc_id"].append(doc_id)
                    rows["page"].append(pg)
                    rows["order"].append(order)
                    rows["kind"].append(b.get("kind", "text"))
                    rows["text"].append(b.get("text", ""))
                    rows["bbox"].append([float(v) for v in b["bbox"]])
        return pa.Table.from_pydict(rows, schema=PDF_BLOCK_SCHEMA)
