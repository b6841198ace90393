"""Decode-backend seam (round-12 verdict task 7): the library swap is a
FLAG, not a rewrite — `decode_image(backend="pil")` / the
NIBBLEDB_DECODE_BACKEND env var route every mapInPandas decode stage
through PIL/libjpeg-turbo where it exists, and the two backends are
pinned EQUIVALENT on the fixture corpus: bit-exact for lossless formats
(PPM/BMP/PNG), tolerance-bounded for JPEG (libjpeg's integer IDCT and
the pure float IDCT legitimately differ in the last levels).

This container ships no codec libs, so the equivalence matrix skips
here and runs wherever Pillow is installed (a real cluster image); the
routing contract itself is asserted everywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from nibbledb_spark.operators.multimodal import decode_image

from test_extensions import _bmp, _jpeg_bytes, _jpeg_progressive_bytes, _png_bytes, _ppm

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _gradient(h, w):
    """Deterministic full-range RGB test pattern (not constant-color:
    exercises subsampling, DCT energy, and row filters)."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x * y * 7 + x + 3 * y) % 256).astype(np.uint8)
    return np.dstack([r, g, b])


def _ppm_of(img):
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def test_backend_routing_pure_default():
    arr = decode_image(_ppm(4, 3, (10, 200, 30)))
    assert arr.shape == (3, 4, 3)
    arr2 = decode_image(_ppm(4, 3, (10, 200, 30)), backend="pure")
    assert (np.asarray(arr) == np.asarray(arr2)).all()


def test_backend_routing_rejects_unknown(monkeypatch):
    with pytest.raises(ValueError, match="unknown decode backend"):
        decode_image(_ppm(2, 2, (1, 2, 3)), backend="webgpu")
    # env flag is read at call time (the executor-worker contract)
    monkeypatch.setenv("NIBBLEDB_DECODE_BACKEND", "webgpu")
    with pytest.raises(ValueError, match="unknown decode backend"):
        decode_image(_ppm(2, 2, (1, 2, 3)))


@pytest.mark.skipif(HAVE_PIL, reason="PIL present: the seam resolves")
def test_pil_backend_fails_closed_without_pillow():
    with pytest.raises(RuntimeError, match="requires Pillow"):
        decode_image(_ppm(2, 2, (1, 2, 3)), backend="pil")


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed here")
def test_pil_equivalence_lossless():
    """Pure decoders == PIL bit-for-bit on every lossless fixture."""
    img = _gradient(13, 17)
    h, w = img.shape[:2]
    fixtures = {
        "ppm": _ppm_of(img),
        "bmp_bottom_up": _bmp(w, h, (10, 200, 30)),
        "bmp_top_down": _bmp(w, h, (10, 200, 30), top_down=True),
        "png_rgb": _png_bytes(img, 2, 0),
        "png_rgb_paeth": _png_bytes(img, 2, 4),
        "png_gray": _png_bytes(img[:, :, :1], 0, 1),
    }
    for name, payload in fixtures.items():
        pure = np.asarray(decode_image(payload, backend="pure"))
        lib = np.asarray(decode_image(payload, backend="pil"))
        assert pure.shape == lib.shape, name
        assert (pure == lib).all(), (name, int(np.abs(
            pure.astype(int) - lib.astype(int)).max()))


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed here")
def test_pil_equivalence_jpeg_tolerance():
    """JPEG: the two IDCTs must agree within 2 levels per sample —
    beyond re-encoding noise, enough to pin a wrong huffman walk,
    dequant table, or chroma upsample (those diverge by tens)."""
    img = _gradient(24, 32)
    for name, payload in {
        "baseline": _jpeg_bytes(img),
        "baseline_420": _jpeg_bytes(img, subsample=True),
        "progressive": _jpeg_progressive_bytes(img),
    }.items():
        pure = np.asarray(decode_image(payload, backend="pure")).astype(int)
        lib = np.asarray(decode_image(payload, backend="pil")).astype(int)
        assert pure.shape == lib.shape, name
        assert np.abs(pure - lib).max() <= 2, (
            name, int(np.abs(pure - lib).max()))
