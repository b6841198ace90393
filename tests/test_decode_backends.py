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


# --- audio/video backend seam (round-13 verdict task 6) ----------------

from nibbledb_spark.operators.multimodal import (  # noqa: E402
    _backend_set,
    decode_audio,
)

from test_extensions import _avi_mjpeg_bytes, _wav  # noqa: E402

try:
    import soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except ImportError:
    HAVE_SOUNDFILE = False

try:
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False


def test_backend_token_set_parsing():
    """The flag is a comma token set: one cluster-wide value can swap
    any subset of the decode paths; unknown tokens fail loudly."""
    assert _backend_set(None) == {"pure"}
    assert _backend_set("pil,soundfile,pyav") == {"pil", "soundfile", "pyav"}
    assert _backend_set(" pil , soundfile ") == {"pil", "soundfile"}
    with pytest.raises(ValueError, match="unknown decode backend"):
        _backend_set("pil,webgpu")


def test_audio_video_tokens_do_not_touch_image_path():
    """Selecting the audio/video library tokens must leave decode_image
    on the pure path (per-media routing, not a global switch)."""
    from test_extensions import _ppm

    arr = decode_image(_ppm(4, 3, (9, 8, 7)), backend="soundfile,pyav")
    assert arr.shape == (3, 4, 3)


def test_image_token_does_not_touch_audio_path():
    samples, rate = decode_audio(_wav(440), backend="pil")
    assert rate == 8000 and samples.shape[1] == 1


@pytest.mark.skipif(HAVE_SOUNDFILE, reason="soundfile installed")
def test_audio_soundfile_missing_library_raises():
    """A missing library must fail loudly (RuntimeError naming the
    package), never fall back silently — half a cluster decoding pure
    while the other half uses libsndfile would be a silent skew."""
    with pytest.raises(RuntimeError, match="soundfile"):
        decode_audio(_wav(440), backend="soundfile")


@pytest.mark.skipif(HAVE_AV, reason="av installed")
def test_video_pyav_missing_library_raises():
    from nibbledb_spark.operators.multimodal import _video_frames_pyav

    with pytest.raises(RuntimeError, match="av package"):
        _video_frames_pyav(b"anything")


@pytest.mark.skipif(not HAVE_SOUNDFILE, reason="soundfile not installed")
def test_audio_backends_equivalent_on_pcm16():
    """libsndfile normalizes PCM by the same 2^(bits-1) divisor, so
    the two backends must agree BIT-EXACTLY on the shared PCM matrix."""
    payload = _wav(440, channels=2)
    pure, r1 = decode_audio(payload, backend="pure")
    lib, r2 = decode_audio(payload, backend="soundfile")
    assert r1 == r2
    assert pure.shape == lib.shape
    assert (pure == lib).all()


@pytest.mark.skipif(not HAVE_AV, reason="av not installed")
def test_video_backends_equivalent_on_mjpeg_avi(spark):
    """Same sampled frame indexes/timestamps on the constant-rate
    MJPEG AVI clock; pixels tolerance-bounded (libavcodec's integer
    IDCT vs the pure float IDCT)."""
    from nibbledb_spark.operators.multimodal import video_keyframes

    frames = [_jpeg_bytes(_gradient(16, 16)) for _ in range(5)]
    avi = _avi_mjpeg_bytes(frames, rate=2)  # 500 ms per frame
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi))],
        "media_id long, kind string, payload binary",
    )
    pure = video_keyframes(media, every_ms=700, backend="pure").collect()
    lib = video_keyframes(media, every_ms=700, backend="pyav").collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in pure] == [
        (r["frame_idx"], r["frame_ts_ms"]) for r in lib
    ]
    for rp, rl in zip(pure, lib):
        ap = decode_image(bytes(rp["frame"])).astype(int)
        al = decode_image(bytes(rl["frame"])).astype(int)
        assert ap.shape == al.shape
        assert np.abs(ap - al).max() <= 4
