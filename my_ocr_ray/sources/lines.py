"""Annotation-line readers: the reference's loader/parser surface on Ray Data.

- ``read_recog_annotations``: format1 ``sample.jpg hello`` / format2
  ``sample.jpg x1 y1 ... x4 y4 hello`` (``mmocr/datasets/base_dataset.py:
  36-41``, parsed like ``LineStrParser`` ``mmocr/datasets/utils/parser.py:
  8-51``) -> (filename, text, box).
- ``read_det_annotations``: line-delimited JSON det annotations
  (``base_dataset.py:19-34``, ``LineJsonParser`` ``parser.py:98-121``)
  -> one row per image with a nested annotation list.
- ``filter_missing_files``: the fork's ``LoaderParsertxt`` missing-image
  filter (``loader.py:54-118``).

All readers are ``read_text -> map_batches(parse)`` — parse work happens in
tasks, not on the driver.
"""
from __future__ import annotations

import json
import os

import pyarrow as pa

RECOG_SCHEMA = pa.schema(
    [
        ("filename", pa.string()),
        ("text", pa.string()),
        ("box", pa.list_(pa.float32())),  # empty list when format1
    ]
)


def parse_recog_lines(batch: pa.Table, separator: str = " ") -> pa.Table:
    """format1/format2 recognition annotation lines -> rows."""
    files, texts, boxes = [], [], []
    for line in batch["text"].to_pylist():
        line = line.strip()
        if not line:
            continue
        parts = line.split(separator)
        if len(parts) >= 10 and all(_is_float(p) for p in parts[1:9]):
            # format2: filename + 8 coords + text (text may contain spaces)
            files.append(parts[0])
            boxes.append([float(p) for p in parts[1:9]])
            texts.append(separator.join(parts[9:]))
        elif len(parts) >= 2:
            files.append(parts[0])
            boxes.append([])
            texts.append(separator.join(parts[1:]))
        # else: skip degenerate line (reference skips empty/short lines,
        # loader.py:88-97)
    return pa.Table.from_pydict(
        {
            "filename": pa.array(files, pa.string()),
            "text": pa.array(texts, pa.string()),
            "box": pa.array(boxes, pa.list_(pa.float32())),
        }
    )


def parse_multi_sep_lines(
    batch: pa.Table,
    keys: tuple[str, ...] = ("filename", "text"),
    keys_idx: tuple[int, ...] = (0, 1),
    separators: str = " ",
    on_short: str = "raise",
) -> pa.Table:
    """``LineStrParser2`` semantics (``mmocr/datasets/utils/parser.py:
    53-96``): every non-space character of ``separators`` is normalized to a
    space, the line is whitespace-split, and ``keys_idx`` selects the token
    per output key.  The reference raises on lines with too few tokens;
    ``on_short='skip'`` instead drops them (keeps a streaming job alive on
    dirty data)."""
    assert len(keys) == len(keys_idx)
    if on_short not in ("raise", "skip"):
        raise ValueError(f"on_short must be raise|skip, got {on_short}")
    need = max(keys_idx)
    cols: dict[str, list[str]] = {k: [] for k in keys}
    for line in batch["text"].to_pylist():
        norm = line
        for ch in separators:
            if ch != " ":
                norm = norm.replace(ch, " ")
        parts = norm.split()
        if len(parts) <= need:
            if not parts:
                continue  # blank line (reference's loader pre-filters these)
            if on_short == "raise":
                raise ValueError(f"key index {need} out of range: {parts}")
            continue
        for k, i in zip(keys, keys_idx):
            cols[k].append(parts[i])
    return pa.Table.from_pydict(
        {k: pa.array(v, pa.string()) for k, v in cols.items()}
    )


def read_multi_sep_annotations(
    path: str,
    keys: tuple[str, ...] = ("filename", "text"),
    keys_idx: tuple[int, ...] = (0, 1),
    separators: str = " ",
    on_short: str = "raise",
):
    """annotation txt with mixed separators -> Dataset(keys...)."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        parse_multi_sep_lines,
        batch_format="pyarrow",
        fn_kwargs={
            "keys": keys,
            "keys_idx": keys_idx,
            "separators": separators,
            "on_short": on_short,
        },
    )


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def read_recog_annotations(path: str, separator: str = " "):
    """annotation txt -> Dataset(filename, text, box)."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        parse_recog_lines, batch_format="pyarrow", fn_kwargs={"separator": separator}
    )


DET_ANN_STRUCT = pa.struct(
    [
        ("iscrowd", pa.int8()),
        ("category_id", pa.int32()),
        ("bbox", pa.list_(pa.float32())),
        ("segmentation", pa.list_(pa.list_(pa.float32()))),
    ]
)

DET_SCHEMA = pa.schema(
    [
        ("file_name", pa.string()),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("annotations", pa.list_(DET_ANN_STRUCT)),
    ]
)


def parse_det_lines(batch: pa.Table) -> pa.Table:
    rows = {"file_name": [], "height": [], "width": [], "annotations": []}
    for line in batch["text"].to_pylist():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        rows["file_name"].append(obj["file_name"])
        rows["height"].append(int(obj["height"]))
        rows["width"].append(int(obj["width"]))
        anns = []
        for a in obj.get("annotations", []):
            anns.append(
                {
                    "iscrowd": int(a.get("iscrowd", 0)),
                    "category_id": int(a.get("category_id", 1)),
                    "bbox": [float(v) for v in a.get("bbox", [])],
                    "segmentation": [
                        [float(v) for v in poly]
                        for poly in a.get("segmentation", [])
                    ],
                }
            )
        rows["annotations"].append(anns)
    return pa.Table.from_pydict(rows, schema=DET_SCHEMA)


def read_det_annotations(path: str):
    """line-JSON det annotation file -> Dataset with nested annotations."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        parse_det_lines, batch_format="pyarrow"
    )


GCN_SCHEMA = pa.schema(
    [
        ("labels", pa.list_(pa.int32())),
        ("text_inds", pa.list_(pa.list_(pa.int32()))),
        ("text_length", pa.list_(pa.int32())),
        ("norm_boxes", pa.list_(pa.list_(pa.float32()))),
        ("src", pa.list_(pa.int32())),
        ("dst", pa.list_(pa.int32())),
        ("edge_data", pa.list_(pa.list_(pa.float32()))),
    ]
)

_GCN_KEYS = tuple(f.name for f in GCN_SCHEMA)


def parse_gcn_lines(batch: pa.Table) -> pa.Table:
    """``LoadGCNAnnotations`` (``mmocr/datasets/pipelines/loading.py:
    376-385``) as a typed reader: the reference projects the fixed GCN key
    set out of each sample's ``ann_info`` dict; here each JSON line IS the
    ann_info and the projection lands in a nested Arrow row — node labels +
    token indices + graph edges stay columnar for the KIE stages."""
    rows: dict[str, list] = {k: [] for k in _GCN_KEYS}
    for line in batch["text"].to_pylist():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        for k in _GCN_KEYS:
            rows[k].append(obj[k])
    return pa.Table.from_pydict(rows, schema=GCN_SCHEMA)


def read_gcn_annotations(path: str):
    """line-JSON GCN/KIE annotation file -> Dataset with the reference's
    seven-key schema."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        parse_gcn_lines, batch_format="pyarrow"
    )


def filter_missing_files(ds, root: str, filename_col: str = "filename"):
    """Drop rows whose referenced file does not exist under ``root``
    (``LoaderParsertxt`` semantics)."""
    def check(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [os.path.exists(os.path.join(root, f)) for f in batch[filename_col].to_pylist()]
        )
        return batch.filter(mask)

    return ds.map_batches(check, batch_format="pyarrow")


def parse_coco_json(data: dict) -> pa.Table:
    """COCO-style det annotations -> the DET_SCHEMA table.

    ``IcdarDataset.load_annotations`` analog (``mmocr/datasets/
    icdar_dataset.py:31-55``): joins the ``image_id -> annotations`` index
    into one nested row per image at ingest (pre-joined struct column,
    SURVEY.md §2.4)."""
    by_img: dict[int, list[dict]] = {}
    for a in data.get("annotations", []):
        by_img.setdefault(int(a["image_id"]), []).append(a)
    rows = {"file_name": [], "height": [], "width": [], "annotations": []}
    for img in data.get("images", []):
        rows["file_name"].append(img["file_name"])
        rows["height"].append(int(img["height"]))
        rows["width"].append(int(img["width"]))
        anns = []
        for a in by_img.get(int(img["id"]), []):
            anns.append(
                {
                    "iscrowd": int(a.get("iscrowd", 0)),
                    "category_id": int(a.get("category_id", 1)),
                    "bbox": [float(v) for v in a.get("bbox", [])],
                    "segmentation": [
                        [float(v) for v in poly]
                        for poly in a.get("segmentation", [])
                    ],
                }
            )
        rows["annotations"].append(anns)
    return pa.Table.from_pydict(rows, schema=DET_SCHEMA)


def read_coco_annotations(path: str, limit: int | None = None):
    """COCO json file -> Dataset (with optional ``select_first_k`` debug
    limit, ``icdar_dataset.py:24,49-54`` -> ``ds.limit``)."""
    import ray.data

    with open(path) as f:
        data = json.load(f)
    ds = ray.data.from_arrow(parse_coco_json(data))
    return ds.limit(limit) if limit else ds
