"""Mergeable sketches for corpus-scale approximate aggregation.

HyperLogLog (Flajolet et al. 2007, the public HLL paper) over md5-derived
64-bit hashes: register maxima are commutative and associative, so the
distributed merge is order-independent and the whole estimate is
DETERMINISTIC for a given input set — reruns and different cluster sizes
produce the identical answer (unlike sampling). The per-block state is
2^p bytes however large the block, which is what makes approximate
distinct-count feasible where the exact two-level shape
(``queries.q_distinct_users``) would have to shuffle every distinct pair.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def hash64_strings(values) -> np.ndarray:
    """Deterministic 64-bit md5-prefix hash per value (str or int)."""
    arr = [str(v) for v in values]
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in arr
        ),
        dtype=np.uint64,
        count=len(arr),
    )


def hll_registers(h: np.ndarray, p: int = 12) -> np.ndarray:
    """uint8[2^p] register array for a batch of 64-bit hashes: register
    index = top p bits, value = max over items of (leading-zero count of
    the remaining 64-p bits) + 1. Vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # leading zeros of a 64-bit int, vectorized via float64 exponent trick
    # is unsafe past 2^53 — use a 4-bit nibble table loop (16 iterations max)
    lz = np.zeros(len(h), dtype=np.uint8)
    x = rest.copy()
    mask_hi = np.uint64(0xFFFFFFFF00000000)
    for shift in (32, 16, 8, 4, 2, 1):
        high = (x >> np.uint64(64 - shift)) == 0
        lz[high] += np.uint8(shift)
        x[high] = x[high] << np.uint64(shift)
    rho = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Classic HLL estimator with small-range (linear counting) and
    large-range corrections."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)
    if est > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1 - est / (1 << 32))
    return float(est)


def grouped_hll_distinct(ds, group_key: str, value_key: str, p: int = 12):
    """Approximate per-group distinct count: per block one register array
    per group (map-side, 2^p bytes each), coalesce the tiny sketch rows to
    one block, max-merge per group, estimate. ONE trivial exchange of
    (groups x blocks) sketch rows — never the distinct pairs."""

    def partial(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch[group_key].to_pylist(), dtype=object)
        vals = batch[value_key].to_pylist()
        h = hash64_strings(vals)
        uniq = np.unique(groups)
        out_g, out_r = [], []
        for g in uniq:
            mask = groups == g
            out_g.append(g)
            out_r.append(hll_registers(h[mask], p))
        return pa.Table.from_pydict(
            {
                group_key: pa.array(list(out_g), pa.string()),
                "regs": pa.array(
                    [r.tobytes() for r in out_r], pa.large_binary()
                ),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch[group_key].to_pylist(), dtype=object)
        regs = [np.frombuffer(b, dtype=np.uint8) for b in batch["regs"].to_pylist()]
        uniq = np.unique(groups)
        out_g, out_n = [], []
        for g in uniq:
            merged = np.zeros(1 << p, dtype=np.uint8)
            for r, gg in zip(regs, groups):
                if gg == g:
                    merged = np.maximum(merged, r)
            out_g.append(g)
            out_n.append(int(round(hll_estimate(merged))))
        return pa.Table.from_pydict(
            {
                group_key: pa.array(list(out_g), pa.string()),
                "n_distinct_approx": pa.array(out_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
