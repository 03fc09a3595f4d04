"""Pure-stdlib PDF 1.4 codec: generator -> decoder round trip and the
NotImplementedError seam for out-of-profile constructs."""
import zlib

import pytest

from my_ocr_ray.sources.pdf import (
    PDF_LEADING,
    PDF_PAGE_LINES,
    PdfDecoder,
    pdf_lines,
    synth_pdf,
)


def test_roundtrip_multi_page_text_order():
    text = " ".join(f"w{i:03d}" for i in range(6 * PDF_PAGE_LINES + 7))
    pages = PdfDecoder().decode(synth_pdf(1, text))
    lines = pdf_lines(text)
    assert len(pages) == 2
    flat = [b for pg in pages for b in pg if b["kind"] == "text"]
    assert [b["text"] for b in flat] == lines
    # line geometry: Courier fixed advance, 16pt leading, top-down coords
    b0, b1 = pages[0][0], pages[0][1]
    assert b0["bbox"] == [72.0, 60.0, pytest.approx(72 + 7.2 * len(lines[0])), 72.0]
    assert b1["bbox"][1] == 60.0 + PDF_LEADING


def test_image_xobject_even_docs_only():
    blocks = PdfDecoder().decode(synth_pdf(4, "one two"))[0]
    imgs = [b for b in blocks if b["kind"] == "image"]
    assert imgs == [{"kind": "image", "text": "", "bbox": [72.0, 704.0, 136.0, 752.0]}]
    assert not any(
        b["kind"] == "image" for b in PdfDecoder().decode(synth_pdf(5, "one two"))[0]
    )


def test_string_escapes_roundtrip():
    text = r"par(en) close) back\slash"
    blocks = PdfDecoder().decode(synth_pdf(3, text))[0]
    assert " ".join(b["text"] for b in blocks) == " ".join(text.split())


def test_tj_kerning_narrows_width():
    # hand-built content stream: TJ with positive adjustment shrinks advance
    content = b"BT /F1 10 Tf 0 100 Td [(ab) 500 (cd)] TJ ET"
    comp = zlib.compress(content)
    pdf = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    (blk,) = PdfDecoder().decode(pdf)[0]
    assert blk["text"] == "abcd"
    # width = 4 glyphs * 0.6 * 10 - 500/1000 * 10 = 24 - 5 = 19
    assert blk["bbox"][2] - blk["bbox"][0] == pytest.approx(19.0)
    # y flip against MediaBox height 200: baseline 100, size 10
    assert blk["bbox"][1] == pytest.approx(90.0) and blk["bbox"][3] == pytest.approx(100.0)


def test_out_of_profile_raises():
    with pytest.raises(NotImplementedError):
        PdfDecoder().decode(b"not a pdf")
    ok = synth_pdf(9, "hello world")
    # unsupported filter
    bad = ok.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(NotImplementedError):
        PdfDecoder().decode(bad)
    # non-Courier font metrics
    bad = ok.replace(b"/BaseFont /Courier", b"/BaseFont /Helvetic")
    with pytest.raises(NotImplementedError):
        PdfDecoder().decode(bad)


def test_xref_offsets_valid():
    pdf = synth_pdf(2, "alpha beta gamma")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    body = pdf[xref_at:].split(b"\n")
    n = int(body[1].split()[1])
    for num, line in enumerate(body[2 : 2 + n]):
        off = int(line.split()[0])
        if num == 0:
            continue  # free-list head
        assert pdf[off:].startswith(b"%d 0 obj" % num)
