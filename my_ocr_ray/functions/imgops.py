"""Image preprocessing kernels: resize, perspective warp, normalize, pad.

Pure-numpy reimplementations of the reference's inference-relevant image ops
(no cv2):

- ``resize_ocr``      — ``mmocr/datasets/pipelines/ocr_transforms.py:18-127``
  (ResizeOCR): fixed height, keep-aspect width snapped to a multiple of
  ``1/width_downsample_ratio``, clamped to [min_width, max_width], right-pad
  to max_width, emit ``valid_ratio``.
- ``warp_quad``       — ``mmocr/datasets/pipelines/crop.py:40-83`` (warp_img):
  perspective-rectify a quad to an axis-aligned rectangle
  (cv2.getPerspectiveTransform + warpPerspective equivalent, inverse-mapped
  bilinear sampling).
- ``normalize_image`` — Normalize: ``(x - mean) / std``
  (``ocr_transforms.py:144-155``).
- ``pad_divisor``     — Pad(size_divisor=32) from the det test pipeline
  (``configs/textdet/dbnet/dbnet_r18_fpnc_1200e_icdar2015.py:60-74``).
"""
from __future__ import annotations

import math

import numpy as np


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of a 2-D uint8/float image (align-corners=False)."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img.astype(np.float32)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_ocr(
    img: np.ndarray,
    height: int = 32,
    min_width: int = 32,
    max_width: int = 160,
    keep_aspect_ratio: bool = True,
    width_downsample_ratio: float = 1.0 / 16,
) -> tuple[np.ndarray, float]:
    """ResizeOCR semantics: -> (padded float image (height, max_width),
    valid_ratio).

    Width math mirrors ``ocr_transforms.py:87-125``: new_width =
    ceil(aspect * height), snapped UP to a multiple of
    ``1/width_downsample_ratio``, clamped to [min_width, max_width]; the
    image is right-padded to ``max_width`` and
    ``valid_ratio = resize_width / max_width``.
    """
    h, w = img.shape[:2]
    if not keep_aspect_ratio:
        out = resize_bilinear(img, height, max_width)
        return out, 1.0
    divisor = int(round(1.0 / width_downsample_ratio))
    new_w = math.ceil(w / h * height)
    new_w = math.ceil(new_w / divisor) * divisor
    new_w = max(min_width, min(max_width, new_w))
    resized = resize_bilinear(img, height, new_w)
    out = np.zeros((height, max_width), dtype=np.float32)
    out[:, :new_w] = resized
    if new_w < max_width:
        out[:, new_w:] = resized[:, -1:]  # edge-pad like cv2 BORDER_REPLICATE
    valid_ratio = min(1.0, new_w / max_width)
    return out, valid_ratio


def _perspective_coeffs(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Solve the 8-dof homography mapping dst -> src (inverse map), as
    cv2.getPerspectiveTransform would (then inverted)."""
    a = []
    b = []
    for (xd, yd), (xs, ys) in zip(dst, src):
        a.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd])
        a.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd])
        b.extend([xs, ys])
    coeffs = np.linalg.solve(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64))
    return np.append(coeffs, 1.0).reshape(3, 3)


def warp_quad(img: np.ndarray, quad, out_h: int | None = None, out_w: int | None = None) -> np.ndarray:
    """Perspective-rectify the quad region to an axis-aligned rectangle.

    ``quad``: 8 floats clockwise from top-left. Output size defaults to the
    quad's mean edge lengths. Bilinear sampling, zero fill outside.
    """
    q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    if out_w is None:
        out_w = int(round((np.linalg.norm(q[1] - q[0]) + np.linalg.norm(q[2] - q[3])) / 2))
    if out_h is None:
        out_h = int(round((np.linalg.norm(q[3] - q[0]) + np.linalg.norm(q[2] - q[1])) / 2))
    out_w, out_h = max(out_w, 1), max(out_h, 1)
    dst = np.array([[0, 0], [out_w, 0], [out_w, out_h], [0, out_h]], dtype=np.float64)
    m = _perspective_coeffs(q, dst)
    xs, ys = np.meshgrid(np.arange(out_w) + 0.5, np.arange(out_h) + 0.5)
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=-1) @ m.T
    sx = pts[..., 0] / pts[..., 2] - 0.5
    sy = pts[..., 1] / pts[..., 2] - 0.5
    h, w = img.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    out = np.zeros((out_h, out_w), dtype=np.float32)
    valid = (x0 >= -1) & (x0 < w) & (y0 >= -1) & (y0 < h)

    def sample(yy, xx):
        yy = np.clip(yy, 0, h - 1)
        xx = np.clip(xx, 0, w - 1)
        return img.astype(np.float32)[yy, xx]

    val = (
        sample(y0, x0) * (1 - fx) * (1 - fy)
        + sample(y0, x0 + 1) * fx * (1 - fy)
        + sample(y0 + 1, x0) * (1 - fx) * fy
        + sample(y0 + 1, x0 + 1) * fx * fy
    )
    out[valid] = val[valid]
    return out


def normalize_image(img: np.ndarray, mean: float = 127.0, std: float = 127.0) -> np.ndarray:
    """NormalizeOCR: (x - mean) / std, float32."""
    return (img.astype(np.float32) - mean) / std


def pad_divisor(img: np.ndarray, divisor: int = 32, value: float = 0.0) -> np.ndarray:
    """Pad bottom/right so both dims are multiples of ``divisor``."""
    h, w = img.shape[:2]
    nh = math.ceil(h / divisor) * divisor
    nw = math.ceil(w / divisor) * divisor
    if (nh, nw) == (h, w):
        return img
    out = np.full((nh, nw), value, dtype=img.dtype)
    out[:h, :w] = img
    return out


class TPSPreprocessor:
    """Recognition-preprocessor seam (``mmocr/models/textrecog/preprocessor/
    tps_preprocessor.py:25-82``: TPS-based STN rectification of curved text
    before the recognizer).

    The sandbox has no torch, so this stand-in keeps the reference's
    CONTRACT — a callable applied to each word crop inside the recognition
    stage, constructed once per actor — while the transform itself is a
    deterministic resize-to-rectified-size no-op.  A real deployment swaps
    ``_rectify`` for the learned grid sample; everything around it
    (actor-pool construction, per-crop invocation point in
    ``OCRStage.__call__``) is the production seam.
    """

    def __init__(
        self,
        num_fiducial: int = 20,
        img_size: tuple[int, int] | None = None,
        rectified_img_size: tuple[int, int] | None = None,
    ):
        if num_fiducial <= 0:
            raise ValueError("num_fiducial must be positive")
        self.num_fiducial = num_fiducial
        self.img_size = img_size
        self.rectified_img_size = rectified_img_size

    def _rectify(self, crop: np.ndarray) -> np.ndarray:
        if self.rectified_img_size is None or crop.size == 0:
            return crop
        h, w = self.rectified_img_size
        out = resize_bilinear(crop.astype(np.float32), h, w)
        return out > 0.5 if crop.dtype == bool else out.astype(crop.dtype)

    def __call__(self, crop: np.ndarray) -> np.ndarray:
        return self._rectify(crop)
