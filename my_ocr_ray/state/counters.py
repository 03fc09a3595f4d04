"""Shared character-frequency counter — the reference's only cross-record
mutable state, done right.

The fork's ``Prober``/``balanceSample`` keep a module-global ``statistics``
dict inside each DataLoader worker (``mmocr/datasets/utils/balance_sampler.py:
7-27,36-70``) — per-process copies that are never synchronized (a known sharp
edge flagged in SURVEY.md §3.3). Here it is a named detached Ray actor:
batch fns send *batched* count deltas (never per-record RPCs), sampling
weights are read once per batch/epoch.
"""
from __future__ import annotations

from collections import Counter


class _CharFrequency:
    def __init__(self) -> None:
        self.counts: Counter = Counter()

    def add_counts(self, delta: dict[str, int]) -> None:
        self.counts.update(delta)

    def totals(self) -> dict[str, int]:
        return dict(self.counts)

    def rarity_weights(self, alpha: float = 1.0) -> dict[str, float]:
        """chars -> sampling weight ~ 1 / (count+1)^alpha, normalized to
        mean 1 (the ``balanceSample`` bias toward rare chars)."""
        if not self.counts:
            return {}
        w = {c: 1.0 / ((n + 1) ** alpha) for c, n in self.counts.items()}
        mean = sum(w.values()) / len(w)
        return {c: v / mean for c, v in w.items()}


def char_frequency_actor(name: str = "char_frequency"):
    """Get-or-create the named counter actor (cluster-wide singleton)."""
    import ray

    cls = ray.remote(num_cpus=0)(_CharFrequency)
    try:
        return ray.get_actor(name)
    except ValueError:
        try:
            return cls.options(name=name, lifetime="detached").remote()
        except ValueError:
            return ray.get_actor(name)  # lost the creation race


def count_chars_batch(texts: list[str]) -> dict[str, int]:
    """Batched per-task delta (ship ONE dict per batch to the actor)."""
    c: Counter = Counter()
    for t in texts:
        c.update(t)
    return dict(c)
