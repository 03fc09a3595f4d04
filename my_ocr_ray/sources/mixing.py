"""Dataset mixing: union-all and weighted sampling mixes.

Ray-Data-native form of ``UniformConcatDataset``
(``mmocr/datasets/uniform_concat_dataset.py:7-29``) and the fork's
``WeightedConcatDataset`` (``mmocr/datasets/weighted_concat_dataset.py:6-43``,
per-dataset sampling weights + epoch-length override).
"""
from __future__ import annotations

from functools import reduce


def union_all(datasets):
    """UniformConcatDataset: concatenate datasets (same schema)."""
    if not datasets:
        raise ValueError("no datasets")
    return reduce(lambda a, b: a.union(b), datasets)


def weighted_mix(datasets, weights, seed: int = 0):
    """WeightedConcatDataset: per-source sampling fractions then union.

    ``weights`` in [0, 1] are per-dataset sample fractions (the reference
    normalizes per-dataset epoch shares; here a weight IS the keep
    fraction). Deterministic via per-source seeds.
    """
    if len(datasets) != len(weights):
        raise ValueError("datasets and weights length mismatch")
    sampled = []
    for i, (ds, w) in enumerate(zip(datasets, weights)):
        if w >= 1.0:
            sampled.append(ds)
        elif w > 0:
            sampled.append(ds.random_sample(w, seed=seed * 1000 + i))
    return union_all(sampled)


def weighted_hash_sample(ds, id_key: str, group_key: str, keep_buckets: dict,
                         default_keep: int = 0, buckets: int = 10):
    """Deterministic weighted sampling: keep a row iff its md5-of-id bucket
    is below the per-group quota (``keep_buckets[group]`` of ``buckets``).

    The oracle-able, shuffle-free form of :func:`weighted_mix` — per-source
    rates are exact in expectation, reproducible across runs and cluster
    sizes, and resumable (membership is a pure function of the row id).
    Appends a ``bucket`` column."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_key].to_numpy(zero_copy_only=False)
        b = np.fromiter(
            (
                (
                    int.from_bytes(
                        hashlib.md5(str(int(i)).encode()).digest()[:8], "big"
                    )
                    >> 4
                )
                % buckets
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        groups = batch[group_key].to_pylist()
        quota = np.fromiter(
            (keep_buckets.get(g, default_keep) for g in groups),
            dtype=np.int64,
            count=len(groups),
        )
        keep = b < quota
        return batch.filter(pa.array(keep)).append_column(
            "bucket", pa.array(b[keep], pa.int64())
        )

    return ds.map_batches(sample, batch_format="pyarrow")
