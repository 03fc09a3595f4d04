"""Small Arrow-table helpers shared across kernels."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def pull_column_numpy(ds, col: str, dtype=None) -> np.ndarray:
    """Driver-side concat of ONE column of a small materialized Dataset.

    For key sets that are already globally unique (the output of a
    key-hash exchange + per-partition reduction), ``Dataset.unique(col)``
    would pay a second groupby all-to-all and return a Python list; this
    pulls the column's blocks straight to the driver as numpy instead.
    Only call it on datasets known to fit driver memory (the callers all
    gate on a broadcast row-count threshold first).
    """
    parts = [
        b[col].to_numpy(zero_copy_only=False)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not parts:
        return np.empty(0, dtype=dtype if dtype is not None else np.int64)
    out = np.concatenate(parts)
    return out.astype(dtype, copy=False) if dtype is not None else out


def agg_named(g: pa.Table, mapping: dict) -> pa.Table:
    """Order-proof rename of ``pa.Table.group_by().aggregate()`` output.

    pyarrow names aggregate columns deterministically (``{col}_{agg}``,
    ``count_all``) but their POSITION relative to the key columns has
    flipped across releases (keys-first in 16.x, keys-last in older
    ones), so a positional ``rename_columns`` silently mislabels the
    stats on a pyarrow up/downgrade. ``mapping`` is
    ``{aggregate_output_name: desired_name}``; iteration order defines
    the output column order, so downstream positional access stays
    deterministic.
    """
    return g.select(list(mapping)).rename_columns(list(mapping.values()))
