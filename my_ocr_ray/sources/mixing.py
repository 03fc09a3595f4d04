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
