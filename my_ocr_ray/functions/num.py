"""Numeric helpers shared across query pipelines.

``round_away`` mirrors DuckDB's ``round`` (ties away from zero) so float
outputs hash-compare equal against the SQL oracles; numpy's ``np.round`` is
half-to-even and diverges on exactly-representable ties (e.g. 105/128).
"""
from __future__ import annotations

import numpy as np


def round_away(x, digits: int):
    """Round half away from zero, elementwise (DuckDB ``round`` semantics)."""
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def round_away_scalar(x: float, digits: int) -> float:
    return float(round_away(np.float64(x), digits))
