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


def run_extract_partitioned(
    docs_dir: str,
    media_path: str,
    out_dir: str,
    *,
    num_partitions: int = 16,
    scale: int = 2,
    ocr_concurrency=4,
    ocr_batch_size: int = 256,
    two_phase_salt: int | None = None,
    max_partitions: int | None = None,
) -> dict:
    """Run all incomplete partitions; returns a summary dict.

    ``max_partitions`` bounds how many partitions this invocation processes
    (used by the resume test to simulate a mid-job kill).
    """
    import ray.data

    groups = _partition_files(docs_dir, num_partitions)
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
        pdir = part_dir(out_dir, pid)
        os.makedirs(pdir, exist_ok=True)
        result.write_parquet(pdir)
        out_files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        import ray as _ray

        tables = _ray.get(ray.data.read_parquet(out_files).to_arrow_refs())
        merged = pa.concat_tables(tables) if tables else pa.table({})
        metrics = _span_metrics(merged) if merged.num_rows else {"docs": 0}
        write_manifest(
            out_dir,
            pid,
            input_files=files,
            rows_in=rows_in,
            rows_out=merged.num_rows,
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
