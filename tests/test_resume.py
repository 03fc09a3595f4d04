"""Resumability: a killed run (simulated by max_partitions) resumes by
skipping completed partitions and produces exactly the full golden output."""
import os

import pytest

from my_ocr_ray.pipelines.runner import (
    read_output,
    run_extract_partitioned,
)
from my_ocr_ray.state.manifest import completed_partitions, read_manifest
from my_ocr_ray.synth import corpus_tables


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory, ray_session):
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("resume_corpus")
    docs, media, expected = corpus_tables(30, seed=21)
    docs_dir = base / "documents"
    docs_dir.mkdir()
    # several input files so partitioning has something to split
    rows_per_file = 5
    for i in range(0, docs.num_rows, rows_per_file):
        pq.write_table(
            docs.slice(i, rows_per_file), docs_dir / f"docs-{i:04d}.parquet"
        )
    media_path = base / "media.parquet"
    pq.write_table(media, media_path)
    return str(docs_dir), str(media_path), expected


def test_partial_run_then_resume(corpus_dirs, ray_session, tmp_path):
    docs_dir, media_path, expected = corpus_dirs
    out_dir = str(tmp_path / "out")

    kw = dict(num_partitions=4, ocr_concurrency=2)
    # simulate a kill after 2 partitions
    s1 = run_extract_partitioned(
        docs_dir, media_path, out_dir, max_partitions=2, **kw
    )
    assert s1["processed_now"] == 2
    assert len(completed_partitions(out_dir)) == 2

    # resume: finishes the remaining partitions, does not redo done ones
    s2 = run_extract_partitioned(docs_dir, media_path, out_dir, **kw)
    assert s2["processed_now"] == 2
    assert s2["completed"] == 4

    # idempotent third run
    s3 = run_extract_partitioned(docs_dir, media_path, out_dir, **kw)
    assert s3["processed_now"] == 0

    got = {
        r["doc_id"]: [dict(s) for s in r["spans"]]
        for r in read_output(out_dir).take_all()
    }
    exp = {r["doc_id"]: r["spans"] for r in expected.to_pylist()}
    assert got == exp


def test_manifest_lineage_contents(corpus_dirs, ray_session, tmp_path):
    docs_dir, media_path, _ = corpus_dirs
    out_dir = str(tmp_path / "out2")
    run_extract_partitioned(
        docs_dir, media_path, out_dir, num_partitions=2, ocr_concurrency=2
    )
    m = read_manifest(out_dir, 0)
    assert m["rows_in"] > 0 and m["rows_out"] == m["rows_in"]
    assert m["metrics"]["docs"] == m["rows_out"]
    assert m["metrics"]["spans"] >= m["metrics"]["media_spans"] >= 0
    assert all(os.path.exists(f) for f in m["input_files"])
    assert m["wall_sec"] > 0


def test_dirty_kill_orphans_are_cleared(corpus_dirs, ray_session, tmp_path):
    """A kill AFTER write_parquet starts but BEFORE the manifest lands
    leaves uuid-named orphan files in the partition dir; the resume must
    clear them, not append alongside (which would duplicate documents)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from my_ocr_ray.state.manifest import part_dir

    docs_dir, media_path, expected = corpus_dirs
    out_dir = str(tmp_path / "out3")
    kw = dict(num_partitions=4, ocr_concurrency=2)
    run_extract_partitioned(docs_dir, media_path, out_dir, max_partitions=2, **kw)

    # simulate the dirty kill: partition 2 incomplete (no manifest) but its
    # directory already holds output from the killed attempt — use a copy of
    # a completed partition's file so the stale rows are realistic documents
    done_pid = sorted(completed_partitions(out_dir))[0]
    stale_src = next(
        f for f in os.listdir(part_dir(out_dir, done_pid)) if f.endswith(".parquet")
    )
    pdir = part_dir(out_dir, 2)
    os.makedirs(pdir, exist_ok=True)
    stale = pq.read_table(os.path.join(part_dir(out_dir, done_pid), stale_src))
    pq.write_table(stale, os.path.join(pdir, "orphan-from-killed-run.parquet"))

    run_extract_partitioned(docs_dir, media_path, out_dir, **kw)
    assert not os.path.exists(os.path.join(pdir, "orphan-from-killed-run.parquet"))

    got = {
        r["doc_id"]: [dict(s) for s in r["spans"]]
        for r in read_output(out_dir).take_all()
    }
    exp = {r["doc_id"]: r["spans"] for r in expected.to_pylist()}
    assert got == exp  # dict equality also proves no duplicated doc_ids

    total = read_output(out_dir).count()
    assert total == len(exp)  # and no extra rows survive anywhere


def test_resume_with_different_partition_count_rejected(
    corpus_dirs, ray_session, tmp_path
):
    docs_dir, media_path, _ = corpus_dirs
    out_dir = str(tmp_path / "out4")
    run_extract_partitioned(
        docs_dir, media_path, out_dir, num_partitions=4,
        ocr_concurrency=2, max_partitions=1,
    )
    with pytest.raises(ValueError, match="num_partitions"):
        run_extract_partitioned(
            docs_dir, media_path, out_dir, num_partitions=2, ocr_concurrency=2
        )


def test_sigkill_resume_flagship_bench_scale(ray_session, tmp_path):
    """Bench-scale kill-and-resume (round-4 ask): a real SIGKILL mid-run on
    the sf0.01-sized flagship corpus, resumed via the partition manifests —
    no duplicated or missing partitions, span-equality 1.0 after resume."""
    import glob
    import signal
    import subprocess
    import sys
    import time

    import os

    import pyarrow.dataset as pads

    from my_ocr_ray.pipelines.evaluate import extraction_accuracy
    from my_ocr_ray.synth import write_corpus

    n_parts = 8
    # sf0.01-sized corpus split into 8 input files so the partitioned
    # runner has real partitions to resume across (ensure_corpus writes a
    # single file at this size); cached like ensure_corpus
    corpus = "/tmp/myocr_bench/corpus_2000_13_f8"
    if not os.path.exists(f"{corpus}/DONE"):
        write_corpus(corpus, 2000, seed=13, docs_per_block=250)
        with open(f"{corpus}/DONE", "w") as f:
            f.write("ok")
    out_dir = str(tmp_path / "out_kill")

    # the child owns its own fresh Ray session (RAY_ADDRESS=local starts a
    # private instance); capped CPUs keep it light next to the test session
    child = subprocess.Popen(
        [
            sys.executable, "-m", "my_ocr_ray", "--num-cpus", "4", "run",
            "--docs", f"{corpus}/documents", "--media", f"{corpus}/media",
            "--out", out_dir, "--partitions", str(n_parts),
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if completed_partitions(out_dir):
                break
            if child.poll() is not None:
                raise AssertionError("child finished before the kill")
            time.sleep(0.02)
        child.send_signal(signal.SIGKILL)
    finally:
        child.wait()
    done_at_kill = completed_partitions(out_dir)
    assert 0 < len(done_at_kill) < n_parts, done_at_kill

    # resume in the test session: only the incomplete partitions run
    s = run_extract_partitioned(
        f"{corpus}/documents", f"{corpus}/media", out_dir,
        num_partitions=n_parts,  # ocr_concurrency auto-sizes to the session
    )
    assert s["completed"] == n_parts
    assert s["processed_now"] == n_parts - len(done_at_kill)
    assert completed_partitions(out_dir) == list(range(n_parts))  # no dup/missing

    expected = pads.dataset(
        sorted(glob.glob(f"{corpus}/expected/*.parquet")), format="parquet"
    ).to_table()
    acc = extraction_accuracy(read_output(out_dir), expected)
    assert acc["docs"] == 2000
    assert acc["span_equality_rate"] == 1.0
    assert acc["media_text_acc"] == 1.0
