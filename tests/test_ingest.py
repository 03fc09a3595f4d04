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
