"""Minimal pure-numpy MAT-File Level 5 reader (TotalText det annotations).

The sandbox has no scipy, but TotalText's ground truth is a ``polygt``
MATLAB cell matrix of per-instance rows ``[marker, X, Y, marker, word, ...]``
(reference ``tools/data/textdet/totaltext_converter.py:75-117``
``get_contours_mat``). The MAT5 container format is publicly documented
(MathWorks "MAT-File Format", R2006b+): a 128-byte header, then a sequence
of tagged data elements; arrays are ``miMATRIX`` elements whose subelements
carry flags/dims/name/payload, cell arrays nest further ``miMATRIX``
elements in column-major order, and whole elements may be zlib-wrapped as
``miCOMPRESSED``.

This reader supports exactly what the det annotations need: compressed and
plain elements, cell / char / logical / numeric array classes, little-endian
files. Unsupported classes (structs, objects, sparse, complex) raise.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

# MAT5 data types (miXXX)
_MI_INT8, _MI_UINT8 = 1, 2
_MI_INT16, _MI_UINT16 = 3, 4
_MI_INT32, _MI_UINT32 = 5, 6
_MI_SINGLE, _MI_DOUBLE = 7, 9
_MI_INT64, _MI_UINT64 = 12, 13
_MI_MATRIX, _MI_COMPRESSED = 14, 15
_MI_UTF8, _MI_UTF16, _MI_UTF32 = 16, 17, 18

_MI_DTYPES = {
    _MI_INT8: np.int8,
    _MI_UINT8: np.uint8,
    _MI_INT16: np.int16,
    _MI_UINT16: np.uint16,
    _MI_INT32: np.int32,
    _MI_UINT32: np.uint32,
    _MI_SINGLE: np.float32,
    _MI_DOUBLE: np.float64,
    _MI_INT64: np.int64,
    _MI_UINT64: np.uint64,
}

# MATLAB array classes (mxXXX_CLASS)
_MX_CELL, _MX_STRUCT, _MX_OBJECT, _MX_CHAR, _MX_SPARSE = 1, 2, 3, 4, 5
_MX_DOUBLE, _MX_SINGLE = 6, 7
_MX_NUMERIC = {6, 7, 8, 9, 10, 11, 12, 13, 14, 15}
_MX_LOGICAL_FLAG = 0x0200


def _iter_elements(buf: memoryview, pos: int, end: int):
    """Yield (mi_type, payload memoryview) for each tagged element,
    handling the small-data-element packing (payload <= 4 bytes lives in
    the tag's second word)."""
    while pos + 8 <= end:
        word0, word1 = struct.unpack_from("<II", buf, pos)
        small_len = word0 >> 16
        if small_len:  # small data element
            mi = word0 & 0xFFFF
            yield mi, buf[pos + 4 : pos + 4 + small_len]
            pos += 8
            continue
        mi, nbytes = word0, word1
        yield mi, buf[pos + 8 : pos + 8 + nbytes]
        pos += 8 + nbytes
        if mi != _MI_COMPRESSED:
            # element payloads pad to 8-byte boundaries — EXCEPT
            # miCOMPRESSED, which the MAT5 spec exempts; padding it
            # would misalign every element after the first compressed
            # variable in a multi-variable file
            pos += (-pos) % 8


def _read_numeric(mi: int, payload: memoryview) -> np.ndarray:
    if mi not in _MI_DTYPES:
        raise ValueError(f"unsupported numeric mi type {mi}")
    return np.frombuffer(payload, dtype=np.dtype(_MI_DTYPES[mi]).newbyteorder("<"))


def _parse_matrix(payload: memoryview):
    """One miMATRIX payload -> (name, value). value is a numpy array
    (numeric, order='F' reshaped), a str (char array rows joined for 1-row
    arrays, else list of row strings), or a nested object array (cell)."""
    def _next(what: str, *, optional: bool = False):
        # a zero-element numeric/char array may be written without a
        # trailing data subelement; anything else missing is a truncation
        e = next(elems, None)
        if e is None and not optional:
            raise ValueError(f"truncated miMATRIX element: missing {what}")
        return e

    elems = _iter_elements(payload, 0, len(payload))
    mi, flags_raw = _next("array flags")
    flags = _read_numeric(mi, flags_raw).view(np.uint32)
    mx_class = int(flags[0] & 0xFF)
    mi, dims_raw = _next("dimensions")
    dims = tuple(int(d) for d in _read_numeric(mi, dims_raw))
    mi, name_raw = _next("array name")
    name = bytes(name_raw).decode("ascii", errors="replace")

    if mx_class == _MX_CELL:
        n = int(np.prod(dims)) if dims else 0
        cells = []
        for _ in range(n):
            mi, cell_payload = _next("cell subelement")
            if mi != _MI_MATRIX:
                raise ValueError("cell subelement is not miMATRIX")
            cells.append(_parse_matrix(cell_payload)[1])
        out = np.empty(len(cells), dtype=object)
        for i, c in enumerate(cells):
            out[i] = c
        # cells are serialized column-major
        return name, out.reshape(dims, order="F") if dims else out

    if mx_class == _MX_CHAR:
        e = _next("char data", optional=int(np.prod(dims)) == 0 if dims else True)
        if e is None:  # zero-element char array without a data element
            return name, ""
        mi, data_raw = e
        if mi in (_MI_UINT16, _MI_UTF16):
            codes = np.frombuffer(data_raw, dtype="<u2")
            chars = "".join(map(chr, codes))
        elif mi in (_MI_UINT8, _MI_INT8, _MI_UTF8):
            chars = bytes(data_raw).decode("utf-8", errors="replace")
        else:
            raise ValueError(f"unsupported char storage mi type {mi}")
        if len(dims) == 2 and dims[0] > 1:
            # column-major char matrix -> one string per row
            m, n = dims
            grid = np.array(list(chars)).reshape((m, n), order="F")
            return name, ["".join(row) for row in grid]
        return name, chars

    if mx_class in _MX_NUMERIC:
        e = _next("numeric data", optional=int(np.prod(dims)) == 0 if dims else True)
        if e is None:  # zero-element numeric array without a data element
            arr = np.zeros(0, dtype=np.float64)
            if dims:
                arr = arr.reshape(dims, order="F")
            return name, arr
        mi, data_raw = e
        arr = _read_numeric(mi, data_raw)
        if int(flags[0]) & 0x0800:  # complex flag
            raise ValueError("complex arrays unsupported")
        if dims:
            arr = arr.reshape(dims, order="F")
        if mx_class == _MX_DOUBLE and arr.dtype != np.float64:
            arr = arr.astype(np.float64)  # compressed-storage widening
        elif mx_class == _MX_SINGLE and arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        return name, arr

    raise ValueError(f"unsupported MATLAB array class {mx_class}")


def loadmat_bytes(data: bytes) -> dict:
    """MAT5 file bytes -> {variable name: value} (scipy.io.loadmat analog
    for the supported subset)."""
    if len(data) < 128:
        raise ValueError("not a MAT5 file: short header")
    endian = data[126:128]
    if endian == b"MI":
        raise ValueError("big-endian MAT files unsupported")
    if endian != b"IM":
        raise ValueError("not a MAT5 file: bad endian indicator")
    buf = memoryview(data)
    out: dict = {}
    for mi, payload in _iter_elements(buf, 128, len(data)):
        if mi == _MI_COMPRESSED:
            inner = memoryview(zlib.decompress(bytes(payload)))
            sub = list(_iter_elements(inner, 0, len(inner)))
            if len(sub) != 1 or sub[0][0] != _MI_MATRIX:
                raise ValueError("compressed element is not one miMATRIX")
            name, value = _parse_matrix(sub[0][1])
        elif mi == _MI_MATRIX:
            name, value = _parse_matrix(payload)
        else:
            continue  # skip non-matrix top-level elements
        out[name] = value
    return out


def _as_str(word) -> str:
    if isinstance(word, str):
        return word
    if isinstance(word, list):  # multi-row char array
        return word[0] if word else ""
    if isinstance(word, np.ndarray):
        return _as_str(word.flat[0]) if word.size else ""
    return str(word)


def parse_totaltext_polygt(mat: dict) -> list[tuple[np.ndarray, str]]:
    """``polygt`` cell matrix -> [(flat xy contour, word)], mirroring
    ``totaltext_converter.py:75-117`` ``get_contours_mat``: row layout is
    ``[_, X, _, Y, word, ...]`` (1-indexed fields 1 and 3 are the coordinate
    vectors), empty word -> '???', '#' rows are ignore instances and are
    skipped entirely."""
    polygt = mat["polygt"]
    out: list[tuple[np.ndarray, str]] = []
    for row in polygt:
        x = np.atleast_2d(np.asarray(row[1], dtype=np.float64))
        y = np.atleast_2d(np.asarray(row[3], dtype=np.float64))
        word = _as_str(row[4]) if len(row) > 4 else ""
        if word == "":
            word = "???"
        if word == "#":
            continue
        arr = np.concatenate([x, y]).T  # (k, 2)
        out.append((arr.reshape(-1), word))
    return out


def parse_totaltext_gt(data: bytes) -> list[dict]:
    """TotalText .mat gt bytes -> DET annotation dicts (iscrowd /
    category_id / COCO-XYWH bbox / flat segmentation), the same shape the
    icdar/ctw1500 line parsers emit (``pipelines.ingest``)."""
    anns = []
    for contour, _word in parse_totaltext_polygt(loadmat_bytes(data)):
        xs, ys = contour[0::2], contour[1::2]
        anns.append(
            {
                "iscrowd": 0,
                "category_id": 1,
                "bbox": [
                    float(xs.min()),
                    float(ys.min()),
                    float(xs.max() - xs.min()),
                    float(ys.max() - ys.min()),
                ],
                "segmentation": [[float(v) for v in contour]],
            }
        )
    return anns
