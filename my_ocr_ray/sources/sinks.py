"""Result sinks: boundary txt/csv export and JSON result dumps.

Ray-Data-native forms of the reference's result writers:
- per-image boundary txt (csv of rounded coords, score-filtered) —
  ``tools/det_test_imgs.py:30-50``
- end-to-end JSON result dump — ``mmocr/utils/ocr.py:107-121`` /
  ``mmcv.dump`` pickle sink ``tools/test.py:203-206`` (columnar parquet is
  the canonical sink here; these are the interchange formats).
"""
from __future__ import annotations

import pyarrow as pa


def boundaries_to_text_rows(
    batch: pa.Table,
    boundary_col: str = "boundaries",
    key_col: str = "doc_id",
    min_score: float = 0.0,
) -> pa.Table:
    """Rows of (key, list of boundary lists) -> one csv line per boundary:
    ``x1,y1,...,xk,yk`` with coords rounded to int, score-filtered
    (det_test_imgs semantics). Output: (key, line)."""
    keys_out, lines = [], []
    for key, blist in zip(
        batch[key_col].to_pylist(), batch[boundary_col].to_pylist()
    ):
        for b in blist:
            if b[-1] < min_score:
                continue
            coords = [str(int(round(v))) for v in b[:-1]]
            keys_out.append(key)
            lines.append(",".join(coords))
    return pa.Table.from_pydict(
        {key_col: pa.array(keys_out, pa.string()), "line": pa.array(lines, pa.string())}
    )


def write_boundary_txt(ds, out_dir: str, **kwargs) -> None:
    """Distributed boundary export: one csv line per kept boundary."""
    ds.map_batches(
        boundaries_to_text_rows, batch_format="pyarrow", fn_kwargs=kwargs
    ).write_csv(out_dir)


def write_json_results(ds, out_dir: str) -> None:
    """JSON-lines result dump (``ds.write_json`` — the mmcv.dump analog)."""
    ds.write_json(out_dir)


def det_rows_to_line_json(batch: pa.Table) -> pa.Table:
    """DET_SCHEMA rows -> one line-json string per image
    (``tools/data/textdet/coco_to_line_dict.py:34-45`` output format):
    ``{"file_name", "height", "width", "annotations": [...]}`` with the
    annotation key order the reference emits. Output: (line)."""
    import json

    lines = []
    for fn, h, w, anns in zip(
        batch["file_name"].to_pylist(),
        batch["height"].to_pylist(),
        batch["width"].to_pylist(),
        batch["annotations"].to_pylist(),
    ):
        lines.append(
            json.dumps(
                {
                    "file_name": fn,
                    "height": h,
                    "width": w,
                    "annotations": [
                        {
                            "iscrowd": a["iscrowd"],
                            "category_id": a["category_id"],
                            "bbox": a["bbox"],
                            "segmentation": a["segmentation"],
                        }
                        for a in anns
                    ],
                }
            )
        )
    return pa.Table.from_pydict({"line": pa.array(lines, pa.string())})


def write_line_json(det_ds, out_dir: str) -> list[dict]:
    """Distributed line-json export of a DET table — the COCO -> line-dict
    conversion (LineJsonParser's input format) as a streaming sink.

    Each task writes its block as one raw txt shard (csv writers would
    quote-escape the json). Returns the (path, n_lines) shard manifest."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        lines = det_rows_to_line_json(batch)["line"].to_pylist()
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.txt")
        with open(path, "w", encoding="utf-8") as f:
            for ln in lines:
                f.write(ln + "\n")
        return pa.Table.from_pydict(
            {
                "path": pa.array([path], pa.string()),
                "n_lines": pa.array([len(lines)], pa.int64()),
            }
        )

    return det_ds.map_batches(dump, batch_format="pyarrow").take_all()
