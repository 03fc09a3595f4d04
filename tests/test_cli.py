"""CLI surface: python -m my_ocr_ray synth/extract in a fresh process
(the CLI owns its own Ray session, so it must run out-of-process from the
test fixture's session)."""
import glob
import json
import os
import subprocess
import sys

import pyarrow.dataset as pads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    out = subprocess.run(
        [sys.executable, "-m", "my_ocr_ray", "--num-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_cli_synth_extract_roundtrip(tmp_path):
    corpus = tmp_path / "corpus"
    r = _run("synth", "--out", str(corpus), "--n-docs", "40")
    assert r["status"] == "ok"

    out = tmp_path / "out"
    r = _run(
        "extract",
        "--docs", str(corpus / "documents"),
        "--media", str(corpus / "media"),
        "--out", str(out),
    )
    assert r["status"] == "ok"

    got = {
        x["doc_id"]: x["spans"]
        for x in pads.dataset(
            sorted(glob.glob(str(out / "*.parquet")))
        ).to_table().to_pylist()
    }
    want = {
        x["doc_id"]: x["spans"]
        for x in pads.dataset(
            sorted(glob.glob(str(corpus / "expected" / "*.parquet")))
        ).to_table().to_pylist()
    }
    assert got == want and len(got) == 40


def test_cli_query_runs_named_query(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "my_ocr_ray", "--num-cpus", "4",
         "query", "len_quantiles", "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    r = json.loads(lines[-1])
    assert r["status"] == "ok" and r["rows"] == 5
