from my_ocr_ray.functions.imaging import png_encode, render_text_image
from my_ocr_ray.pipelines.ingest import ingest_recog_dataset


def test_ingest_recog_dataset(ray_session, tmp_path):
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    labels = []
    for name, text in [("a.png", "HELLO"), ("b.png", "WORLD 42")]:
        (img_root / name).write_bytes(
            png_encode(render_text_image([text], scale=2))
        )
        labels.append(f"{name} {text}")
    labels.append("missing.png GONE")  # filtered out
    label_file = tmp_path / "label.txt"
    label_file.write_text("\n".join(labels) + "\n")

    out = tmp_path / "media_out"
    n = ingest_recog_dataset(str(label_file), str(img_root), str(out))
    assert n == 2

    import pyarrow.dataset as pads

    tbl = pads.dataset(str(out), format="parquet").to_table().sort_by("media_ref")
    rows = tbl.to_pylist()
    assert [r["media_ref"] for r in rows] == ["a.png", "b.png"]
    assert rows[0]["gt_text"] == "HELLO"
    assert rows[0]["width"] > 0 and rows[0]["height"] > 0  # parsed PNG header
    assert rows[0]["bytes"][:8] == b"\x89PNG\r\n\x1a\n"

    # round-trip: ingested image OCRs back to its label
    from my_ocr_ray.functions.imaging import png_decode
    from my_ocr_ray.functions.ocr import detect_word_boxes, recognize_word

    img = png_decode(rows[0]["bytes"])
    boxes = detect_word_boxes(img, scale=2)
    x0, y0, x1, y1 = int(boxes[0][0]), int(boxes[0][1]), int(boxes[0][4]), int(boxes[0][5])
    text, _ = recognize_word(img[y0:y1, x0:x1], scale=2)
    assert text == "HELLO"


def test_ingest_det_dataset_icdar(ray_session, tmp_path):
    """End-to-end det converter job: images + gt_*.txt -> DET parquet
    (icdar_converter.py semantics: ### -> iscrowd, XYWH envelope bbox)."""
    import numpy as np
    import pyarrow.dataset as pads

    from my_ocr_ray.functions.imaging import png_encode
    from my_ocr_ray.pipelines.ingest import ingest_det_dataset

    img_dir = tmp_path / "imgs"; gt_dir = tmp_path / "gts"
    out_dir = tmp_path / "out"
    img_dir.mkdir(); gt_dir.mkdir()
    img = (np.ones((20, 30)) * 255).astype(np.uint8)
    for stem in ("a", "b"):
        (img_dir / f"{stem}.png").write_bytes(png_encode(img))
    (gt_dir / "gt_a.txt").write_text(
        "0,0,10,0,10,5,0,5,hello\n2,2,8,2,8,9,2,9,###\n"
    )
    (gt_dir / "gt_b.txt").write_text("1,1,4,1,4,4,1,4,x\n")
    n = ingest_det_dataset(str(img_dir), str(gt_dir), str(out_dir),
                           fmt="icdar2015")
    assert n == 2
    t = pads.dataset(str(out_dir), format="parquet").to_table().sort_by("file_name")
    assert t["file_name"].to_pylist() == ["a.png", "b.png"]
    assert t["width"].to_pylist() == [30, 30] and t["height"].to_pylist() == [20, 20]
    anns_a = t["annotations"][0].as_py()
    assert [a["iscrowd"] for a in anns_a] == [0, 1]
    assert anns_a[0]["bbox"] == [0.0, 0.0, 10.0, 5.0]
    assert anns_a[0]["segmentation"] == [[0, 0, 10, 0, 10, 5, 0, 5]]


def test_ingest_det_dataset_ctw1500_line():
    from my_ocr_ray.pipelines.ingest import parse_ctw1500_gt_line

    coords = ",".join(str(v) for v in range(28))
    a = parse_ctw1500_gt_line(coords + ",####some text")
    assert a["iscrowd"] == 0 and len(a["segmentation"][0]) == 28
    assert a["bbox"] == [0.0, 1.0, 26.0, 26.0]


def test_ingest_textocr(ray_session, tmp_path):
    """TextOCR json -> DET rows: '.' marks iscrowd, bbox floor/ceil +
    clamp, polygon points clamped >= 0."""
    import json

    import pyarrow.dataset as pads

    from my_ocr_ray.pipelines.ingest import ingest_textocr

    ann = {
        "imgs": {
            "i1": {"id": "i1", "file_name": "train/a.jpg",
                   "width": 100, "height": 50},
            "i2": {"id": "i2", "file_name": "train/b.jpg",
                   "width": 80, "height": 40},
        },
        "imgToAnns": {"i1": ["a1", "a2"], "i2": []},
        "anns": {
            "a1": {"utf8_string": "word", "bbox": [1.4, 2.6, 3.2, 4.1],
                   "area": 13.1, "points": [1, 2, 5, 2, 5, 7, 1, 7]},
            "a2": {"utf8_string": ".", "bbox": [-2.5, 0.0, 2.0, 2.0],
                   "area": 4.0, "points": [-2, 0, 0, 0, 0, 2, -2, 2]},
        },
    }
    path = tmp_path / "TextOCR_test.json"
    path.write_text(json.dumps(ann))
    out = tmp_path / "det_out"
    n = ingest_textocr(str(path), str(out))
    assert n == 2
    t = pads.dataset(str(out), format="parquet").to_table().sort_by("file_name")
    assert t["file_name"].to_pylist() == ["train/a.jpg", "train/b.jpg"]
    anns_a = t["annotations"][0].as_py()
    assert [a["iscrowd"] for a in anns_a] == [0, 1]
    assert anns_a[0]["bbox"] == [1.0, 2.0, 4.0, 5.0]   # floor x/y, ceil w/h
    assert anns_a[1]["bbox"][0] == 0.0                  # clamped
    assert anns_a[1]["segmentation"] == [[0, 0, 0, 0, 0, 2, 0, 2]]
    assert t["annotations"][1].as_py() == []


def test_ingest_svt(ray_session, tmp_path):
    """SVT xml -> clamped crops named in document order + lexicon table."""
    import numpy as np
    import pyarrow.dataset as pads

    from my_ocr_ray.functions.imaging import png_decode, png_encode
    from my_ocr_ray.pipelines.ingest import ingest_svt

    img = np.arange(20 * 30, dtype=np.uint8).reshape(20, 30)
    (tmp_path / "img").mkdir()
    (tmp_path / "img" / "a.png").write_bytes(png_encode(img))
    xml = """<tagset>
      <image><imageName>img/a.png</imageName><lex>FOO,Bar</lex>
        <taggedRectangles>
          <taggedRectangle x="2" y="3" width="5" height="4">
            <tag>FOO</tag></taggedRectangle>
          <taggedRectangle x="-2" y="0" width="4" height="3">
            <tag>Bar</tag></taggedRectangle>
        </taggedRectangles>
      </image>
    </tagset>"""
    (tmp_path / "test.xml").write_text(xml)
    out = tmp_path / "media_out"
    n = ingest_svt(str(tmp_path / "test.xml"), str(tmp_path), str(out))
    assert n == 2
    t = pads.dataset(str(out), format="parquet").to_table().sort_by("media_ref")
    assert t["media_ref"].to_pylist() == ["img_0001.png", "img_0002.png"]
    assert t["gt_text"].to_pylist() == ["foo", "bar"]
    c1 = png_decode(t["bytes"][0].as_py())
    assert np.array_equal(c1, img[3:7, 2:7])
    c2 = png_decode(t["bytes"][1].as_py())
    assert np.array_equal(c2, img[0:3, 0:2])  # x clamped to 0, x+w=2
    lex = pads.dataset(str(out) + "_lexicon", format="parquet").to_table()
    assert lex["lexicon"].to_pylist() == ["foo,bar", "foo,bar"]
    assert lex["lex_size"].to_pylist() == [2, 2]


def test_ingest_svt_resize(ray_session, tmp_path):
    """--resize parity: crops come out at the fixed recognizer size."""
    import numpy as np
    import pyarrow.dataset as pads

    from my_ocr_ray.functions.imaging import png_encode
    from my_ocr_ray.pipelines.ingest import ingest_svt

    img = np.arange(20 * 30, dtype=np.uint8).reshape(20, 30)
    (tmp_path / "a.png").write_bytes(png_encode(img))
    xml = """<tagset><image><imageName>a.png</imageName><lex>w</lex>
      <taggedRectangles>
        <taggedRectangle x="2" y="3" width="5" height="4"><tag>W</tag>
        </taggedRectangle>
      </taggedRectangles></image></tagset>"""
    (tmp_path / "test.xml").write_text(xml)
    out = tmp_path / "m"
    n = ingest_svt(str(tmp_path / "test.xml"), str(tmp_path), str(out),
                   resize=True, height=8, width=25)
    assert n == 1
    t = pads.dataset(str(out), format="parquet").to_table()
    assert t["height"].to_pylist() == [8] and t["width"].to_pylist() == [25]
