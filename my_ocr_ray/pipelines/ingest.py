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

    # totaltext gt is a binary MAT5 polygt cell matrix (poly_gt_<stem>.mat,
    # parsed whole-file by sources.mat5); the line formats parse per gt line
    is_mat = fmt == "totaltext"
    parse = None if is_mat else _GT_PARSERS[fmt]
    pairs = []
    for suffix in (".png", ".PNG", ".jpg", ".JPG", ".jpeg", ".JPEG"):
        for img in sorted(_glob.glob(os.path.join(img_dir, "*" + suffix))):
            stem = os.path.splitext(os.path.basename(img))[0]
            gt = os.path.join(
                gt_dir,
                f"poly_gt_{stem}.mat" if is_mat else f"gt_{stem}.txt",
            )
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
            if is_mat:
                from ..sources.mat5 import parse_totaltext_gt

                with open(gt_file, "rb") as f:
                    anns = parse_totaltext_gt(f.read())
            else:
                with open(gt_file, encoding="utf-8-sig") as f:
                    anns = [
                        a for a in (parse(ln) for ln in f) if a is not None
                    ]
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


def parse_textocr_ann(ann: dict) -> dict:
    """One TextOCR ann dict -> DET annotation
    (``tools/data/textdet/textocr_converter.py:39-53`` semantics):
    utf8_string '.' marks illegible (iscrowd=1); bbox x/y floored and
    clamped >= 0 with w/h ceiled; polygon points clamped >= 0."""
    import math

    x, y, w, h = ann["bbox"]
    return {
        "iscrowd": 1 if ann["utf8_string"] == "." else 0,
        "category_id": 1,
        "bbox": [
            float(max(0, math.floor(x))),
            float(max(0, math.floor(y))),
            float(math.ceil(w)),
            float(math.ceil(h)),
        ],
        "segmentation": [[float(max(0, int(p))) for p in ann["points"]]],
    }


def ingest_textocr(annotation_path: str, out_dir: str) -> int:
    """TextOCR annotation json -> DET_SCHEMA parquet table.

    The driver only loads the (index-sized) annotation json and slices
    one raw-ann list per image; the numeric parsing and the parquet
    write run in tasks. Returns the ingested image-row count.
    """
    import glob as _glob
    import json as _json

    import pyarrow.dataset as pads
    import ray.data

    from ..sources.lines import DET_SCHEMA

    with open(annotation_path, encoding="utf-8") as f:
        annotation = _json.load(f)
    items = []
    for img in annotation["imgs"].values():
        raw = [annotation["anns"][a] for a in annotation["imgToAnns"][img["id"]]]
        items.append(
            {
                "file_name": img["file_name"],
                "height": int(img["height"]),
                "width": int(img["width"]),
                "anns_json": _json.dumps(raw),
            }
        )
    if not items:
        raise ValueError(f"no images in {annotation_path}")

    def build(batch: pa.Table) -> pa.Table:
        rows = {"file_name": [], "height": [], "width": [], "annotations": []}
        for fn, h, w, aj in zip(
            batch["file_name"].to_pylist(),
            batch["height"].to_pylist(),
            batch["width"].to_pylist(),
            batch["anns_json"].to_pylist(),
        ):
            rows["file_name"].append(fn)
            rows["height"].append(h)
            rows["width"].append(w)
            rows["annotations"].append(
                [parse_textocr_ann(a) for a in _json.loads(aj)]
            )
        return pa.Table.from_pydict(rows, schema=DET_SCHEMA)

    ray.data.from_items(items).map_batches(
        build, batch_format="pyarrow"
    ).write_parquet(out_dir)
    files = sorted(_glob.glob(os.path.join(out_dir, "*.parquet")))
    return pads.dataset(files, format="parquet").count_rows()


def ingest_svt(xml_path: str, img_root: str, out_dir: str,
               resize: bool = False, height: int = 32, width: int = 100) -> int:
    """SVT-style test.xml -> cropped word-image media parquet + lexicon
    side table (``tools/data/textrecog/svt_converter.py:44-76``
    semantics): each taggedRectangle is cropped with rows/cols clamped
    to >= 0, the tag lowercased, and crops named img_0001... in document
    order. The driver parses only the (small) xml; image decode + crop +
    re-encode run in tasks, one task row per source image. The lexicon
    side table (media_ref, lexicon, lex_size) derives from the xml alone,
    so it is written driver-side without touching any image.

    Writes MEDIA_SCHEMA rows under ``out_dir`` and the lexicon table
    under ``out_dir + '_lexicon'``. Returns the crop count.
    """
    import glob as _glob
    import json as _json
    import xml.etree.ElementTree as ET

    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from ..functions.imaging import png_decode, png_encode

    root = ET.parse(xml_path).getroot()
    items, index = [], 1
    for image_node in root.findall("image"):
        name = image_node.find("imageName").text
        lexicon = image_node.find("lex").text.lower()
        lex_size = len(lexicon.split(","))
        rects = []
        for rect in image_node.find("taggedRectangles"):
            rects.append(
                {
                    "x": int(rect.get("x")),
                    "y": int(rect.get("y")),
                    "w": int(rect.get("width")),
                    "h": int(rect.get("height")),
                    "text": rect.find("tag").text.lower(),
                    "ref": f"img_{index:04}.png",
                }
            )
            index += 1
        items.append(
            {
                "img_path": os.path.join(img_root, name),
                "lexicon": lexicon,
                "lex_size": lex_size,
                "rects_json": _json.dumps(rects),
            }
        )
    if not items:
        raise ValueError(f"no <image> entries in {xml_path}")

    def crop(batch: pa.Table) -> pa.Table:
        import json as _j

        rows = {
            "media_ref": [], "bytes": [], "gt_text": [],
            "width": [], "height": [], "n_lines": [],
        }
        for path, rj in zip(
            batch["img_path"].to_pylist(), batch["rects_json"].to_pylist()
        ):
            with open(path, "rb") as f:
                img = png_decode(f.read())
            for r in _j.loads(rj):
                rb, re_ = max(0, r["y"]), max(0, r["y"] + r["h"])
                cb, ce = max(0, r["x"]), max(0, r["x"] + r["w"])
                sub = img[rb:re_, cb:ce]
                if sub.size == 0:
                    sub = np.zeros((1, 1), dtype=np.uint8)
                if resize:
                    # the reference's --resize flag (cv2.resize to a fixed
                    # recognizer input size); bilinear, then back to uint8
                    from ..functions.imgops import resize_bilinear

                    sub = np.clip(
                        np.rint(resize_bilinear(sub, height, width)), 0, 255
                    ).astype(np.uint8)
                rows["media_ref"].append(r["ref"])
                rows["bytes"].append(png_encode(np.ascontiguousarray(sub)))
                rows["gt_text"].append(r["text"])
                rows["height"].append(sub.shape[0])
                rows["width"].append(sub.shape[1])
                rows["n_lines"].append(1)
        return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)

    ray.data.from_items(items).map_batches(
        crop, batch_format="pyarrow"
    ).write_parquet(out_dir)
    lex_rows = {"media_ref": [], "lexicon": [], "lex_size": []}
    for it in items:
        for r in _json.loads(it["rects_json"]):
            lex_rows["media_ref"].append(r["ref"])
            lex_rows["lexicon"].append(it["lexicon"])
            lex_rows["lex_size"].append(it["lex_size"])
    os.makedirs(out_dir + "_lexicon", exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(lex_rows),
        os.path.join(out_dir + "_lexicon", "lexicon.parquet"),
    )
    files = sorted(_glob.glob(os.path.join(out_dir, "*.parquet")))
    return pads.dataset(files, format="parquet").count_rows()
