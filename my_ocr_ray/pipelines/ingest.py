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


def parse_icdar_gt_line(line: str, dataset: str = "icdar2015") -> dict | None:
    """One icdar gt line -> DET annotation dict (``tools/data/textdet/
    icdar_converter.py:106-135`` semantics): 8 int coords, then
    lang(2017)/text; '###' marks ignore (iscrowd=1); bbox is the COCO XYWH
    envelope of the quad."""
    line = line.strip()
    if not line:
        return None
    strs = line.split(",")
    xy = [float(int(x)) for x in strs[0:8]]
    text_field = strs[8] if dataset == "icdar2015" else strs[9]
    xs, ys = xy[0::2], xy[1::2]
    return {
        "iscrowd": int(text_field == "###"),
        "category_id": 1,
        "bbox": [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)],
        "segmentation": [xy],
    }


def parse_ctw1500_gt_line(line: str) -> dict | None:
    """One ctw1500 gt line -> DET annotation dict (``ctw1500_converter.py:
    88-115``): 28 int coords then ',####text'; never ignored."""
    line = line.strip()
    if not line:
        return None
    strs = line.split(",")
    xy = [float(int(x)) for x in strs[0:28]]
    xs, ys = xy[0::2], xy[1::2]
    return {
        "iscrowd": 0,
        "category_id": 1,
        "bbox": [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)],
        "segmentation": [xy],
    }


_GT_PARSERS = {
    "icdar2015": lambda ln: parse_icdar_gt_line(ln, "icdar2015"),
    "icdar2017": lambda ln: parse_icdar_gt_line(ln, "icdar2017"),
    "ctw1500": parse_ctw1500_gt_line,
}


def _png_size(data: bytes) -> tuple[int, int]:
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    return -1, -1


def ingest_det_dataset(
    img_dir: str, gt_dir: str, out_dir: str, fmt: str = "icdar2015"
) -> int:
    """images + per-image gt txt -> DET_SCHEMA parquet table, end to end.

    Ray-native form of the reference's converter jobs (``icdar_converter.py``
    / ``ctw1500_converter.py``): the driver only LISTS (img, gt) pairs; gt
    parsing, image-header reads and the parquet write all run in tasks
    (their ``collect_files -> collect_annotations(nproc)`` loop).  Returns
    the ingested image-row count.
    """
    import glob as _glob

    import ray.data

    from ..sources.lines import DET_SCHEMA

    parse = _GT_PARSERS[fmt]
    pairs = []
    for suffix in (".png", ".PNG", ".jpg", ".JPG", ".jpeg", ".JPEG"):
        for img in sorted(_glob.glob(os.path.join(img_dir, "*" + suffix))):
            stem = os.path.splitext(os.path.basename(img))[0]
            gt = os.path.join(gt_dir, f"gt_{stem}.txt")
            if os.path.exists(gt):
                pairs.append({"img_file": img, "gt_file": gt})
    if not pairs:
        raise FileNotFoundError(f"no (image, gt) pairs under {img_dir}")

    def load(batch: pa.Table) -> pa.Table:
        rows = {"file_name": [], "height": [], "width": [], "annotations": []}
        for img_file, gt_file in zip(
            batch["img_file"].to_pylist(), batch["gt_file"].to_pylist()
        ):
            with open(img_file, "rb") as f:
                data = f.read()
            w, h = _png_size(data)
            with open(gt_file, encoding="utf-8-sig") as f:
                anns = [a for a in (parse(ln) for ln in f) if a is not None]
            rows["file_name"].append(os.path.basename(img_file))
            rows["height"].append(h)
            rows["width"].append(w)
            rows["annotations"].append(anns)
        return pa.Table.from_pydict(rows, schema=DET_SCHEMA)

    ray.data.from_items(pairs).map_batches(
        load, batch_format="pyarrow"
    ).write_parquet(out_dir)
    import glob

    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return pads.dataset(files, format="parquet").count_rows()


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
