"""Ingest jobs: raw annotation-file datasets -> engine tables.

Ray-native form of the reference's one-off dataset converters
(``tools/data/textdet/icdar_converter.py:14-100`` and siblings — their
``collect_files -> collect_annotations (nproc) -> load_img_info`` loop
becomes ``read_text -> map_batches(parse) -> map_batches(attach bytes) ->
write_parquet``; file IO happens in tasks, not on the driver).
"""
from __future__ import annotations

import os

import pyarrow as pa

from ..schema import MEDIA_SCHEMA
from ..sources.lines import filter_missing_files, read_recog_annotations


def _attach_image_bytes(batch: pa.Table, img_root: str) -> pa.Table:
    """(filename, text, box) rows -> MEDIA_SCHEMA rows with file bytes.

    Width/height are parsed from PNG headers when possible (cheap, no
    decode); other formats get -1 (unknown) — the payload stays opaque.
    """
    import struct

    refs, blobs, gts, ws, hs, nl = [], [], [], [], [], []
    for fname, text in zip(batch["filename"].to_pylist(), batch["text"].to_pylist()):
        path = os.path.join(img_root, fname)
        with open(path, "rb") as f:
            data = f.read()
        w = h = -1
        if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
        refs.append(fname)
        blobs.append(data)
        gts.append(text)
        ws.append(w)
        hs.append(h)
        nl.append(text.count("\n") + 1)
    return pa.Table.from_pydict(
        {
            "media_ref": refs,
            "bytes": blobs,
            "gt_text": gts,
            "width": ws,
            "height": hs,
            "n_lines": nl,
        },
        schema=MEDIA_SCHEMA,
    )


def ingest_recog_dataset(
    label_path: str, img_root: str, out_dir: str, separator: str = " "
) -> int:
    """label.txt (format1/format2) + image dir -> media parquet table.

    Missing-image rows are dropped (``LoaderParsertxt`` semantics).
    Returns the ingested row count.
    """
    anns = read_recog_annotations(label_path, separator=separator)
    anns = filter_missing_files(anns, img_root)
    media = anns.map_batches(
        _attach_image_bytes, batch_format="pyarrow", fn_kwargs={"img_root": img_root}
    )
    media.write_parquet(out_dir)
    import glob

    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return pads.dataset(files, format="parquet").count_rows()
