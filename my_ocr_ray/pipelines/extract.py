"""The flagship extraction pipeline: interleaved docs -> extracted docs.

Ray-Data shape (SURVEY.md §3.1 "RD shape"):

    read -> map_batches(explode_spans)            # 1:N fan-out, zero-copy Arrow
         -> map_batches(strip_boilerplate)        # vectorized text routing
         -> map_batches(OCRStage, concurrency=N)  # stateful actor pool (media)
         -> groupby(doc_id) / salted two-phase    # the reassembly shuffle
         -> write_parquet / Dataset

Media strategy:
- ``media_lookup`` (broadcast): the media side table is ``ray.put`` once and
  read inside each OCR actor's ``__init__`` — a map-side hash join against a
  small build side. Right when the media table fits in the object store.
- ``media_join``: hash-join span rows against the media Dataset on
  ``media_ref`` (``Dataset.join``) — the scale path when media bytes are far
  larger than memory. Both paths produce identical results (tested).
"""
from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.ocrstage import OCRStage
from ..stages.reassemble import (
    reassemble,
    reassemble_hash,
    reassemble_two_phase,
)
from ..stages.route import explode_spans
from ..stages.textstage import strip_boilerplate


def load_media_lookup(media_path: str):
    """Read the media table and ``ray.put`` it as a (media_ref, bytes) Arrow
    table.

    Returns an ObjectRef; every OCR actor resolves it once. Broadcasting the
    ARROW TABLE (not a Python dict) matters: ``ray.get`` of an Arrow table is
    zero-copy out of plasma, so per-actor startup cost is just building the
    media_ref -> row-index dict, and the image bytes are shared across all
    actors on a node instead of deserialized per actor.

    The read + index build runs in a detached Ray TASK, not on the driver:
    at 1.6M docs (3.9M media rows, 1.8 GB) the build is ~6s of serial work
    that would otherwise sit on the critical path before the pipeline can
    even start — as a task it overlaps the read/actor-pool ramp-up, and the
    OCR actors block in ``__init__``'s ``ray.get`` only if they win the race.
    """
    import ray

    @ray.remote(num_cpus=2)
    def _build(path):
        if isinstance(path, (list, tuple)) or os.path.isdir(str(path)):
            import pyarrow.dataset as pads

            tbl = pads.dataset(path, format="parquet").to_table(
                columns=["media_ref", "bytes"]
            )
        else:
            tbl = pq.read_table(path, columns=["media_ref", "bytes"])
        from ..stages.ocrstage import _MediaTableLookup

        return _MediaTableLookup.precompute(tbl.combine_chunks())

    return _build.remote(media_path)


# target span rows per shuffle partition: scales partition count LINEARLY
# with data volume once partitions would exceed ~2M rows (~170MB blocks,
# ~1.5s vectorized rebuild each) while keeping the floor at cpus/2.
# Measured: shuffle messaging is O(input blocks x partitions), so an
# aggressive 250k-row target (52 partitions at 1.6M docs) cost 20% end-to-end
# throughput vs 16 partitions with zero tail benefit — partitions must grow
# with DATA, not shrink the target block
SPAN_ROWS_PER_PARTITION = 2_000_000
# average spans per interleaved doc (measured 7.6 on the synthetic corpus);
# used only to size the shuffle, not for correctness
EST_SPANS_PER_DOC = 8


def _approx_input_rows(ds) -> Optional[int]:
    """Row count from metadata only (parquet stats / in-memory tables) —
    never triggers execution; None when the input has no cheap count."""
    try:
        return ds._meta_count()
    except Exception:
        return None


def extract(
    docs_ds,
    media_lookup_ref=None,
    media_ds=None,
    *,
    scale: int = 2,
    ocr_concurrency: Optional[int] = None,
    ocr_batch_size: int = 256,
    two_phase_salt: Optional[int] = None,
    join_num_partitions: Optional[int] = None,
    shuffle: str = "hash",
    shuffle_partitions: Optional[int] = None,
    approx_docs: Optional[int] = None,
    on_error: str = "raise",
    ocr_stage_kwargs: Optional[dict] = None,
):
    """Run the full extraction pipeline; returns a documents-schema Dataset.

    Resource auto-sizing: the OCR actor pool, the hash-shuffle aggregators
    and the join aggregators must all fit on the cluster simultaneously or
    the streaming executor stalls — when ``ocr_concurrency`` is None it is
    sized to what's left after reserving for shuffles and IO tasks.

    Shuffle sizing: the partition count scales with the INPUT SIZE (estimated
    span rows / ``SPAN_ROWS_PER_PARTITION``), floored at one per two CPUs and
    capped at 4x CPUs; the aggregator CPU claim stays a fixed budget
    (~cpus/8) regardless of partition count by shrinking the per-partition
    claim, so growing data never shrinks the OCR pool.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    aggregator_cpu_budget = max(1.0, cpus / 8)
    if shuffle_partitions is None:
        n_docs = approx_docs if approx_docs is not None else _approx_input_rows(docs_ds)
        floor = max(2, cpus // 2)
        cap = max(floor, min(512, 4 * cpus))
        if n_docs is None:
            shuffle_partitions = min(16, floor)
        else:
            by_data = -(-n_docs * EST_SPANS_PER_DOC // SPAN_ROWS_PER_PARTITION)
            shuffle_partitions = int(max(floor, min(cap, by_data)))
    if join_num_partitions is None:
        join_num_partitions = shuffle_partitions
    if ocr_concurrency is None:
        reserve = 2 + aggregator_cpu_budget
        if two_phase_salt:
            reserve += aggregator_cpu_budget  # second hash exchange
        if media_ds is not None:
            reserve += aggregator_cpu_budget
        ocr_concurrency = max(1, int(cpus - reserve))
    spans = docs_ds.map_batches(
        explode_spans,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"with_sentinel": True},
    ).map_batches(strip_boilerplate, batch_format="pyarrow", zero_copy_batch=True)

    if media_ds is not None:
        # scale path: shuffle join span rows <- media bytes on media_ref.
        # Text spans carry media_ref="" and must not be dropped: left join.
        spans = spans.join(
            media_ds.select_columns(["media_ref", "bytes"]),
            join_type="left_outer",
            num_partitions=join_num_partitions,
            on=("media_ref",),
        )

    ocr_kwargs = dict(
        fn_constructor_kwargs={
            "media_lookup_ref": media_lookup_ref,
            "scale": scale,
            "on_error": on_error,
            # stage extension seam (rotation TTA, preprocessor, ...)
            **(ocr_stage_kwargs or {}),
        },
        batch_format="pyarrow",
        batch_size=ocr_batch_size,
    )
    if ocr_concurrency is not None:
        ocr_kwargs["concurrency"] = ocr_concurrency
    processed = spans.map_batches(OCRStage, **ocr_kwargs)

    if two_phase_salt:
        return reassemble_two_phase(
            processed,
            n_salt=two_phase_salt,
            num_partitions=shuffle_partitions,
            aggregator_cpu_budget=aggregator_cpu_budget,
        )
    if shuffle == "hash":
        return reassemble_hash(
            processed,
            num_partitions=shuffle_partitions,
            aggregator_cpu_budget=aggregator_cpu_budget,
        )
    return reassemble(processed)
