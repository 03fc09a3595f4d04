"""Small Arrow-table helpers shared across kernels."""
from __future__ import annotations

import pyarrow as pa


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
