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


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_indices(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    """int64[depth, n] cell index per hash per row, by double hashing the
    64-bit md5 prefix: idx_d = (h_lo + d * h_hi) % width (Kirsch &
    Mitzenmacher 2006 — d independent-enough functions from one hash)."""
    h_lo = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h_hi = (h >> np.uint64(32)).astype(np.int64) | np.int64(1)  # odd stride
    d = np.arange(depth, dtype=np.int64)[:, None]
    return (h_lo[None, :] + d * h_hi[None, :]) % width


def cms_build(h: np.ndarray, counts: np.ndarray, width: int, depth: int) -> np.ndarray:
    """int64[depth, width] sketch from (hash, count) pairs — one scatter-add
    per depth row over DISTINCT items, not per occurrence."""
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(h):
        idx = cms_indices(h, width, depth)
        for d in range(depth):
            np.add.at(sk[d], idx[d], counts)
    return sk


def cms_query(sk: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Point estimate per hash: min over depth rows (>= true count, never
    under; overestimate probability e^-depth per eps*N band)."""
    depth, width = sk.shape
    if not len(h):
        return np.empty(0, dtype=np.int64)
    idx = cms_indices(h, width, depth)
    est = sk[0, idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, sk[d, idx[d]])
    return est


def cms_heavy_hitters(docs_ds, n: int = 3, k: int = 20, width: int = 1 << 16,
                      depth: int = 4, cand_per_block: int | None = None):
    """Approximate corpus top-k n-grams in BOUNDED memory.

    The exact ``corpus.ngram_topk`` shuffles one partial row per distinct
    gram per block — fine while the vocabulary fits an exchange, but at
    100 TB the distinct-trigram table is itself corpus-sized. This variant
    ships exactly ``depth*width*8`` bytes of sketch + ``cand_per_block``
    candidate strings per block, REGARDLESS of vocabulary size:

        map: per-block exact gram counts (arrow value_counts) -> add into a
             local CMS; keep the block's top candidates (a global heavy
             hitter is a heavy hitter in some blocks)
        reduce (one tiny block): SUM the sketches (CMS is linear, so the
             merge is exact and order-independent), union the candidates,
             estimate each via min-over-rows, emit top-k.

    Deterministic for a given input set. Estimates are upper bounds of the
    true counts; with width >> distinct-heavy-mass they are exact, which
    the unit test pins against ``ngram_topk`` on the synthetic corpus.
    Rows-only correctness entry (approximate by construction; the exact
    twin ``ngram_topk`` carries the SQL oracle).
    """

    if cand_per_block is None:
        cand_per_block = 4 * k

    def partial(batch: pa.Table) -> pa.Table:
        from .corpus import _gram_hashes_u64, flat_ngrams

        grams, _, _ = flat_ngrams(batch["text"], n)
        if len(grams) == 0:
            return pa.Table.from_pydict(
                {
                    "sketch": pa.array([], pa.large_binary()),
                    "cand": pa.array([], pa.large_list(pa.string())),
                }
            )
        vc = grams.value_counts()
        vals = vc.field("values")
        cnts = np.asarray(vc.field("counts"), dtype=np.int64)
        h = _gram_hashes_u64(vals)
        sk = cms_build(h, cnts, width, depth)
        # block-local top candidates (count desc, gram asc for determinism)
        vals_np = np.asarray(vals.to_pylist(), dtype=object)
        order = np.lexsort((vals_np, -cnts))[:cand_per_block]
        return pa.Table.from_pydict(
            {
                "sketch": pa.array([sk.tobytes()], pa.large_binary()),
                "cand": pa.array([vals_np[order].tolist()],
                                 pa.large_list(pa.string())),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        from .corpus import _gram_hashes_u64

        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {"ngram": pa.array([], pa.string()),
                 "cnt_est": pa.array([], pa.int64())}
            )
        merged = np.zeros((depth, width), dtype=np.int64)
        for b in batch["sketch"].to_pylist():
            merged += np.frombuffer(b, dtype=np.int64).reshape(depth, width)
        cand = sorted({g for row in batch["cand"].to_pylist() for g in row})
        cand_arr = np.asarray(cand, dtype=object)
        est = cms_query(merged, _gram_hashes_u64(cand_arr))
        order = np.lexsort((cand_arr, -est))[:k]
        return pa.Table.from_pydict(
            {
                "ngram": pa.array(cand_arr[order].tolist(), pa.string()),
                "cnt_est": pa.array(est[order], pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# mergeable quantile-histogram sketch
# ---------------------------------------------------------------------------


def grouped_quantile_sketch(ds, group_key: str, value_key: str,
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                            bins: int = 4096):
    """Approximate per-group quantiles via a fixed-width histogram sketch.

    The exact path (``relational.grouped_quantiles``) shuffles every
    distinct value; this ships exactly ``bins * 8`` bytes per (block,
    group) whatever the block holds — the bounded-memory companion, same
    role the CMS plays for top-k. Two passes: a trivial global min/max
    aggregate fixes shared bin edges, then per-block per-group counts
    sum linearly (order-independent merge -> deterministic result).
    Each estimate is the UPPER EDGE of the first bin whose cumulative
    count reaches ceil(q*n), so it is within one bin width above the
    exact discrete quantile — the unit test pins that bound against
    DuckDB. Rows-only correctness entry (approximate by construction;
    the exact twin carries the SQL oracle)."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(value_key), Max(value_key))
    lo, hi = float(mm[f"min({value_key})"]), float(mm[f"max({value_key})"])
    w = max((hi - lo) / bins, 1e-300)

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_key].combine_chunks()
        denc = groups.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        vals = batch[value_key].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((vals - lo) / w).astype(np.int64), 0, bins - 1)
        n_groups = len(denc.dictionary)
        counts = np.bincount(codes * bins + idx, minlength=n_groups * bins)
        counts = counts.reshape(n_groups, bins).astype(np.int64)
        return pa.Table.from_pydict(
            {
                group_key: denc.dictionary,
                "hist": pa.array([c.tobytes() for c in counts], pa.large_binary()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        cols = {group_key: [], "n": []}
        for q in qs:
            cols[f"p{int(q * 100)}_est"] = []
        if batch.num_rows:
            groups = np.asarray(batch[group_key].to_pylist(), dtype=object)
            hists = [np.frombuffer(b, dtype=np.int64)
                     for b in batch["hist"].to_pylist()]
            for g in np.unique(groups):
                merged = np.zeros(bins, dtype=np.int64)
                for h, gg in zip(hists, groups):
                    if gg == g:
                        merged += h
                n = int(merged.sum())
                cum = np.cumsum(merged)
                cols[group_key].append(g)
                cols["n"].append(n)
                for q in qs:
                    r = max(1, int(np.ceil(q * n)))
                    b = int(np.searchsorted(cum, r))
                    cols[f"p{int(q * 100)}_est"].append(
                        round(lo + (b + 1) * w, 6)
                    )
        out = {group_key: pa.array(cols[group_key], pa.string()),
               "n": pa.array(cols["n"], pa.int64())}
        for q in qs:
            name = f"p{int(q * 100)}_est"
            out[name] = pa.array(cols[name], pa.float64())
        return pa.Table.from_pydict(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
