"""Partitioned, resumable execution of the extraction pipeline.

Partition unit = a group of input parquet files (at cluster scale: input
fragments / key ranges). Each partition runs the full streaming pipeline and
writes its own parquet directory + lineage manifest; a re-run skips completed
partitions (``state.manifest``). Within a partition Ray Data streams with
backpressure; across partitions this loop is the checkpoint boundary.

Per-partition metrics (span-kind counts) are computed as a side aggregate of
the partition's output and stored in the manifest (SURVEY.md §7 stage 6).
"""
from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import (
    completed_partitions,
    is_complete,
    part_dir,
    write_manifest,
)
from .extract import extract, load_media_lookup


def _partition_files(input_dir: str, num_partitions: int) -> list[list[str]]:
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    num_partitions = min(num_partitions, len(files))
    groups: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(files):
        groups[i % num_partitions].append(f)
    return groups


def _span_metrics(tbl: pa.Table) -> dict:
    flat = pc.list_flatten(tbl["spans"].combine_chunks())
    kinds = flat.field("kind")
    return {
        "docs": tbl.num_rows,
        "spans": len(kinds),
        "text_spans": pc.sum(
            pc.cast(pc.equal(kinds, "text"), pa.int64())
        ).as_py()
        or 0,
        "media_spans": pc.sum(
            pc.cast(pc.equal(kinds, "media"), pa.int64())
        ).as_py()
        or 0,
    }


def _metrics_batch(batch: pa.Table) -> pa.Table:
    m = _span_metrics(batch)
    return pa.Table.from_pydict({k: [v] for k, v in m.items()})


def _distributed_span_metrics(files: list[str]) -> dict:
    """Per-kind span counts of a partition's output as a distributed
    aggregate (per-block partials -> tiny sum), never concatenating the
    partition on the driver — a partition at target scale is huge."""
    import ray.data

    partials = ray.data.read_parquet(files, columns=["spans"]).map_batches(
        _metrics_batch, batch_format="pyarrow"
    )
    cols = ["docs", "spans", "text_spans", "media_spans"]
    sums = partials.sum(cols)
    if sums is None:  # empty partition
        return {c: 0 for c in cols}
    return {c: int(sums[f"sum({c})"]) for c in cols}


def _check_run_config(out_dir: str, num_partitions: int) -> None:
    """Record the run's partition count; resuming with a different count
    would re-partition the input differently and double/skip documents."""
    import json

    path = os.path.join(out_dir, "RUN.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("num_partitions") != num_partitions:
            raise ValueError(
                f"resume with num_partitions={num_partitions} but the run was "
                f"started with {prev.get('num_partitions')} — partition "
                "assignment would not line up; use the original value"
            )
        return
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": num_partitions}, f)
    os.replace(tmp, path)


def run_extract_partitioned(
    docs_dir: str,
    media_path: str,
    out_dir: str,
    *,
    num_partitions: int = 16,
    scale: int = 2,
    ocr_concurrency=None,  # None = extract() auto-sizes to the session
                           # (the resource-fit invariant: a fixed pool can
                           # starve the shuffle aggregators on small hosts)
    ocr_batch_size: int = 256,
    two_phase_salt: int | None = None,
    max_partitions: int | None = None,
) -> dict:
    """Run all incomplete partitions; returns a summary dict.

    ``max_partitions`` bounds how many partitions this invocation processes
    (used by the resume test to simulate a mid-job kill).
    """
    import shutil

    import ray.data

    groups = _partition_files(docs_dir, num_partitions)
    _check_run_config(out_dir, len(groups))
    lookup = load_media_lookup(media_path)
    done_before = set(completed_partitions(out_dir))
    processed = 0
    t_start = time.time()
    for pid, files in enumerate(groups):
        if pid in done_before or is_complete(out_dir, pid):
            continue
        if max_partitions is not None and processed >= max_partitions:
            break
        t0 = time.time()
        pdir = part_dir(out_dir, pid)
        if os.path.isdir(pdir):
            # incomplete partition from a killed run: write_parquet appends
            # uuid-named files, so stale orphans would duplicate documents on
            # resume — clear the directory before re-running (the manifest is
            # absent, so nothing completed is lost)
            shutil.rmtree(pdir)
        ds = ray.data.read_parquet(files)
        rows_in = ds.count()
        result = extract(
            ds,
            media_lookup_ref=lookup,
            scale=scale,
            ocr_concurrency=ocr_concurrency,
            ocr_batch_size=ocr_batch_size,
            two_phase_salt=two_phase_salt,
        )
        os.makedirs(pdir, exist_ok=True)
        result.write_parquet(pdir)
        out_files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        metrics = _distributed_span_metrics(out_files) if out_files else {"docs": 0}
        write_manifest(
            out_dir,
            pid,
            input_files=files,
            rows_in=rows_in,
            rows_out=metrics.get("docs", 0),
            metrics=metrics,
            wall_sec=time.time() - t0,
        )
        processed += 1
    return {
        "partitions": len(groups),
        "completed": len(completed_partitions(out_dir)),
        "processed_now": processed,
        "wall_sec": round(time.time() - t_start, 3),
    }


def read_output(out_dir: str):
    """Read all completed partitions as one Dataset."""
    import ray.data

    files = [
        f
        for pid in completed_partitions(out_dir)
        for f in sorted(glob.glob(os.path.join(part_dir(out_dir, pid), "*.parquet")))
    ]
    return ray.data.read_parquet(files)
