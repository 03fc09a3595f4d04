"""Format-agnostic table source: one entry point for the engine's input
tables whatever the storage format.

The target deployment reads Lance tables (the north-rule input format);
this sandbox has no ``lance`` package, so the Lance branch is an
import-gated seam — the dispatch, column pruning and the rest of the
pipeline are format-independent, and a deployment with ``pylance``
installed gets ``ray.data.read_lance`` with zero changes elsewhere.
"""
from __future__ import annotations

import os


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Read a table as a ``ray.data.Dataset``, dispatching on format:
    ``.lance`` directories -> ``read_lance`` (requires the ``lance``
    package), ``.parquet`` file/dir -> ``read_parquet``, ``.csv`` ->
    ``read_csv``, ``.json``/``.jsonl`` -> ``read_json``. ``columns``
    prunes at the scan for parquet/lance; for csv/json it projects
    immediately after the read."""
    import ray.data

    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext == ".lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "reading .lance tables requires the 'lance' package "
                "(pip install pylance); this environment does not have it — "
                "use the parquet twin of the table instead"
            ) from e
        return ray.data.read_lance(path, columns=columns, **kwargs)
    if ext == ".parquet" or os.path.isdir(path):
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if ext == ".csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif ext in (".json", ".jsonl"):
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported table format: {path}")
    return ds.select_columns(columns) if columns else ds
