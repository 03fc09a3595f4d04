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
