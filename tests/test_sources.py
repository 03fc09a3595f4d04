import json

import pyarrow as pa
import pytest

from my_ocr_ray.sources.lines import (
    parse_det_lines,
    parse_recog_lines,
    read_det_annotations,
    read_recog_annotations,
)
from my_ocr_ray.sources.mixing import union_all, weighted_mix
from my_ocr_ray.sources.pdf import FakePdfDecoder, PdfDecoder, PdfLayoutStage


def _text_batch(lines):
    return pa.Table.from_pydict({"text": lines})


def test_parse_recog_format1_and_format2():
    out = parse_recog_lines(
        _text_batch(
            [
                "sample1.jpg hello",
                "sample2.jpg 20 20 100 20 100 40 20 40 world",
                "",  # skipped
                "sample3.jpg multi word text",
            ]
        )
    )
    rows = out.to_pylist()
    assert rows[0] == {"filename": "sample1.jpg", "text": "hello", "box": []}
    assert rows[1]["box"] == [20.0, 20.0, 100.0, 20.0, 100.0, 40.0, 20.0, 40.0]
    assert rows[1]["text"] == "world"
    assert rows[2]["text"] == "multi word text"


def test_parse_det_lines():
    line = json.dumps(
        {
            "file_name": "img1.jpg",
            "height": 100,
            "width": 200,
            "annotations": [
                {
                    "iscrowd": 0,
                    "category_id": 1,
                    "bbox": [0, 0, 10, 10],
                    "segmentation": [[0, 0, 10, 0, 10, 10, 0, 10]],
                }
            ],
        }
    )
    out = parse_det_lines(_text_batch([line])).to_pylist()
    assert out[0]["file_name"] == "img1.jpg"
    assert out[0]["annotations"][0]["segmentation"][0][:4] == [0.0, 0.0, 10.0, 0.0]


def test_read_annotation_files(ray_session, tmp_path):
    ann = tmp_path / "label.txt"
    ann.write_text("a.jpg FOO\nb.jpg BAR BAZ\n")
    rows = read_recog_annotations(str(ann)).take_all()
    assert sorted(r["text"] for r in rows) == ["BAR BAZ", "FOO"]

    det = tmp_path / "instances.txt"
    det.write_text(
        json.dumps({"file_name": "x.jpg", "height": 5, "width": 5, "annotations": []})
        + "\n"
    )
    rows = read_det_annotations(str(det)).take_all()
    assert rows[0]["file_name"] == "x.jpg"


def test_union_and_weighted_mix(ray_session):
    import ray.data

    a = ray.data.range(100)
    b = ray.data.range(100)
    assert union_all([a, b]).count() == 200
    mixed = weighted_mix([a, b], [1.0, 0.5], seed=3)
    n = mixed.count()
    assert 110 <= n <= 190  # 100 + ~50


def test_pdf_stub_raises():
    with pytest.raises(NotImplementedError):
        PdfDecoder().decode(b"%PDF-fake")


def test_pdf_layout_stage_with_fake_decoder(ray_session):
    import ray.data

    pages = [
        [
            {"kind": "text", "text": "right col", "bbox": [50, 0, 90, 10]},
            {"kind": "text", "text": "left top", "bbox": [0, 0, 40, 10]},
            {"kind": "text", "text": "left bottom", "bbox": [0, 20, 40, 30]},
        ]
    ]
    ds = ray.data.from_items(
        [{"doc_id": "d1", "bytes": json.dumps(pages).encode()}]
    )
    out = ds.map_batches(
        PdfLayoutStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"decoder": FakePdfDecoder()},
        concurrency=1,
    ).take_all()
    assert [r["text"] for r in out] == ["left top", "left bottom", "right col"]
    assert [r["order"] for r in out] == [0, 1, 2]
