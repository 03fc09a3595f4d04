"""Pure-numpy MAT5 reader for TotalText det annotations (round-3, VERDICT
r2 item 8). The fixture bytes are produced by a minimal MAT5 writer below
(same public format spec), exercising compressed + plain elements, cell /
char / double classes, and the column-major cell layout."""
import struct
import zlib

import numpy as np

from my_ocr_ray.sources.mat5 import (
    loadmat_bytes,
    parse_totaltext_gt,
    parse_totaltext_polygt,
)


def _el(mi: int, payload: bytes) -> bytes:
    pad = (-len(payload)) % 8
    return struct.pack("<II", mi, len(payload)) + payload + b"\x00" * pad


def _matrix(mx_class: int, dims, name: bytes, sub: bytes) -> bytes:
    flags = struct.pack("<II", mx_class, 0)
    body = (
        _el(6, flags)  # miUINT32 array flags
        + _el(5, np.asarray(dims, dtype="<i4").tobytes())  # miINT32 dims
        + _el(1, name)  # miINT8 name
        + sub
    )
    return _el(14, body)  # miMATRIX


def _char(s: str, name: bytes = b"") -> bytes:
    codes = np.array([ord(c) for c in s], dtype="<u2").tobytes()
    return _matrix(4, [1, len(s)] if s else [0, 0], name, _el(4, codes))


def _double(vals, name: bytes = b"") -> bytes:
    a = np.atleast_2d(np.asarray(vals, dtype="<f8"))
    return _matrix(6, list(a.shape), name,
                   _el(9, a.T.tobytes()))  # column-major payload


def _polygt_mat(rows, compressed: bool = False) -> bytes:
    """rows: list of (xs, ys, word) -> MAT5 bytes with a (n,5) polygt cell."""
    n = len(rows)
    # cell subelements serialize COLUMN-major: all field-0 cells, then all
    # field-1 cells, ...
    cols = [[], [], [], [], []]
    for xs, ys, word in rows:
        cols[0].append(_char("x:"))
        cols[1].append(_double(xs))
        cols[2].append(_char("y:"))
        cols[3].append(_double(ys))
        cols[4].append(_char(word))
    sub = b"".join(c for col in cols for c in col)
    mat = _matrix(1, [n, 5], b"polygt", sub)  # mxCELL
    if compressed:
        mat = _el(15, zlib.compress(mat))
    header = (b"MATLAB 5.0 MAT-file, test fixture".ljust(116) + b"\x00" * 8
              + struct.pack("<H", 0x0100) + b"IM")
    return header + mat


ROWS = [
    ([10.0, 50.0, 50.0, 10.0], [5.0, 5.0, 25.0, 25.0], "HELLO"),
    ([60.0, 80.0, 70.0], [5.0, 5.0, 30.0], "hi"),
    ([0.0, 1.0, 1.0], [0.0, 0.0, 1.0], "#"),   # ignore row: skipped
    ([2.0, 3.0, 3.0], [2.0, 2.0, 3.0], ""),    # empty word -> '???'
]


def test_loadmat_roundtrip_plain_and_compressed():
    for compressed in (False, True):
        mat = loadmat_bytes(_polygt_mat(ROWS, compressed=compressed))
        polygt = mat["polygt"]
        assert polygt.shape == (4, 5)
        assert polygt[0, 4] == "HELLO"
        np.testing.assert_allclose(
            np.asarray(polygt[1, 1], dtype=float).ravel(), [60.0, 80.0, 70.0]
        )


def test_parse_totaltext_polygt_semantics():
    pairs = parse_totaltext_polygt(loadmat_bytes(_polygt_mat(ROWS)))
    words = [w for _, w in pairs]
    assert words == ["HELLO", "hi", "???"]  # '#' row skipped, empty -> ???
    contour0 = pairs[0][0]
    np.testing.assert_allclose(
        contour0, [10, 5, 50, 5, 50, 25, 10, 25]
    )  # interleaved x,y in point order


def test_parse_totaltext_gt_det_annotations():
    anns = parse_totaltext_gt(_polygt_mat(ROWS, compressed=True))
    assert len(anns) == 3
    a0 = anns[0]
    assert a0["iscrowd"] == 0 and a0["category_id"] == 1
    assert a0["bbox"] == [10.0, 5.0, 40.0, 20.0]
    assert a0["segmentation"] == [[10, 5, 50, 5, 50, 25, 10, 25]]


def test_ingest_det_dataset_totaltext(ray_session, tmp_path):
    """End-to-end TotalText converter job: images + poly_gt_*.mat -> DET
    parquet (totaltext_converter.py analog, scipy-free)."""
    import pyarrow.dataset as pads

    from my_ocr_ray.functions.imaging import png_encode, render_text_image
    from my_ocr_ray.pipelines.ingest import ingest_det_dataset

    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    out = tmp_path / "out"
    img_dir.mkdir()
    gt_dir.mkdir()
    for stem in ("a", "b"):
        img = render_text_image(["HI"], scale=2)
        (img_dir / f"{stem}.png").write_bytes(png_encode(img))
        (gt_dir / f"poly_gt_{stem}.mat").write_bytes(
            _polygt_mat(ROWS, compressed=(stem == "a"))
        )
    n = ingest_det_dataset(str(img_dir), str(gt_dir), str(out),
                           fmt="totaltext")
    assert n == 2
    tbl = pads.dataset(str(out), format="parquet").to_table()
    rows = {r["file_name"]: r for r in tbl.to_pylist()}
    assert set(rows) == {"a.png", "b.png"}
    anns = rows["a.png"]["annotations"]
    assert len(anns) == 3  # '#' ignore row skipped
    assert anns[0]["bbox"] == [10.0, 5.0, 40.0, 20.0]


def test_multi_variable_compressed_no_padding():
    """MAT5 exempts miCOMPRESSED elements from 8-byte padding: a second
    compressed variable directly after an odd-length first one must still
    parse (the reader used to pad past its tag)."""
    import struct
    import zlib

    from my_ocr_ray.sources.mat5 import loadmat_bytes

    v1 = _double([1.0, 2.0], name=b"a")
    v2 = _double([3.0], name=b"b")
    c1 = zlib.compress(v1)
    # force an odd compressed length so the element ends off-boundary
    if len(c1) % 8 == 0:
        c1 = zlib.compress(v1, 1)
    e1 = struct.pack("<II", 15, len(c1)) + c1  # no padding, per spec
    e2 = struct.pack("<II", 15, len(zlib.compress(v2))) + zlib.compress(v2)
    header = (b"MATLAB 5.0 MAT-file, test fixture".ljust(116) + b"\x00" * 8
              + struct.pack("<H", 0x0100) + b"IM")
    out = loadmat_bytes(header + e1 + e2)
    assert set(out) == {"a", "b"}
    assert out["b"].ravel().tolist() == [3.0]
