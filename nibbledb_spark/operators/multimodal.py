"""Multimodal column plumbing (SURVEY.md §2 Part C).

Media (image/audio/video) rides as opaque ``binary`` payload columns
with a typed metadata struct. The Spark-side plumbing — schema,
partition sizing, Arrow batch shape through ``mapInPandas`` — is real
and tested; the actual codec work is stubbed (decode libs are not in
this container) behind ``NotImplementedError`` or a clearly-marked
deterministic fake so the pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from struct import error as struct_error

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical media schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = "media_id long, kind string, feature array<float>"


def _decode_bmp(payload: bytes) -> object:
    """Uncompressed 24-bit BI_RGB Windows BMP -> HxWx3 uint8 RGB.

    Pure numpy: parse the BITMAPFILEHEADER pixel offset and the info
    header's width/height/bpp/compression, then reshape the padded
    bottom-up BGR rows. Anything but 24bpp BI_RGB raises — same
    codec-absence seam as compressed formats."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only uncompressed 24-bit BI_RGB BMP decodes without codec libs"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    # bound-check BEFORE frombuffer: hostile headers (e.g. w=h=2^31-1)
    # otherwise overflow C ssize_t or read past the payload — corrupt
    # files must surface as ValueError (flagged), not kill the batch
    if w <= 0 or h <= 0 or planes != 1:
        raise ValueError(f"invalid BMP dimensions {w}x{h_signed}")
    if data_off < 54 or data_off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def _decode_png(payload: bytes) -> object:
    """8-bit non-interlaced PNG -> HxWx3 uint8 RGB — REAL decode with
    zlib (stdlib) + numpy, no codec libs: chunk walk (IHDR/IDAT/IEND,
    CRCs skipped), inflate, then scanline unfiltering per the spec
    (None/Sub/Up/Average/Paeth). Grayscale expands to RGB; RGBA drops
    alpha. Palette, 16-bit, and interlaced files raise at the same
    documented seam as the other codecs.

    Cost note: Sub/Average/Paeth rows are byte-sequential by
    definition (each byte depends on the one bpp earlier), so those
    rows decode in a Python loop — fine inside the Arrow-batched
    ``mapInPandas`` seam at fixture scale; swap PIL in at this seam for
    production throughput.
    """
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        pos += 8
        if ln > len(payload) or pos + ln + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos : pos + ln]
        pos += ln + 4  # skip CRC (integrity is the transport's problem)
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    if w <= 0 or h <= 0 or w * h > 64_000_000:  # hostile-header bound
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    stride = w * channels
    expect = h * (stride + 1)
    # bound the inflate by the size the header promises BEFORE allocating:
    # a decompression bomb must come back as a flagged ValueError, not a
    # MemoryError that kills the whole Arrow batch
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expect + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e
    if len(raw) != expect or d.decompress(b"", 1):
        raise ValueError("PNG pixel data size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up: whole-row vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                if f == 1:  # Sub
                    v = line[i] + a
                elif f == 3:  # Average
                    v = line[i] + ((a + b) >> 1)
                else:  # Paeth
                    c = int(prev[i - channels]) if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[i] + pred
                cur[i] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img


def decode_image(payload: bytes) -> object:
    """Decode a binary image payload to an HxWx3 uint8 numpy array.

    REAL for binary PPM (P6, maxval 255), uncompressed 24-bit BMP, and
    8-bit non-interlaced PNG (gray/RGB/RGBA via stdlib zlib) — pure
    numpy, no codec libs. PPM: header tokens (width, height, maxval;
    ``#`` comments allowed) then raw RGB bytes. Formats whose codecs
    live outside the stdlib (JPEG/WebP/...) still raise — swap in
    PIL/torchvision decode on a real cluster at this exact seam.
    """
    import numpy as np

    if payload.startswith(b"BM"):
        return _decode_bmp(payload)
    if payload.startswith(b"\x89PNG"):
        return _decode_png(payload)
    if not payload.startswith(b"P6"):
        raise NotImplementedError(
            "only PPM(P6), 24-bit BMP, and 8-bit PNG decode without codec "
            "libs; plug PIL in here"
        )
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("16-bit PPM not supported")
    # same hostile-header bound check as the BMP path
    if w <= 0 or h <= 0 or pos + w * h * 3 > len(payload):
        raise ValueError(f"truncated or invalid PPM ({w}x{h})")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def resize_image(arr: object, out_h: int, out_w: int) -> object:
    """Nearest-neighbor resize via numpy index maps — deterministic,
    vectorized, no interpolation libs."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def image_stats_features(media: DataFrame, *, grid: int = 2) -> DataFrame:
    """REAL feature extraction for decodable payloads: per-channel mean
    and population std plus a ``grid x grid`` downsampled luminance map
    — 6 + grid² floats per image, computed from actual pixels via the
    same Arrow-batched ``mapInPandas`` seam as the stubbed encoder.
    Non-decodable payloads yield a null feature (kept, flagged) rather
    than failing the batch — a 100 TB media crawl always contains
    corrupt files, and one bad payload must not kill a 10 GB task."""
    import numpy as np

    dim = 6 + grid * grid
    schema = "media_id long, kind string, feature array<float>, decoded boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                # compute FULLY before appending: a partial append on a
                # late exception would misalign the column lists and
                # fail the whole Arrow batch. TypeError covers NULL
                # payloads (bytes(None)); Zero/IndexError cover
                # degenerate-but-parseable headers.
                try:
                    arr = decode_image(bytes(payload)).astype(np.float64)
                    means = arr.mean(axis=(0, 1)) / 255.0
                    stds = arr.std(axis=(0, 1)) / 255.0
                    lum = arr.mean(axis=2)
                    cells = resize_image(
                        lum[:, :, None], grid, grid
                    ).reshape(grid * grid) / 255.0
                    feature = [np.float32(x) for x in (*means, *stds, *cells)]
                except (
                    NotImplementedError,
                    ValueError,
                    TypeError,
                    ZeroDivisionError,
                    IndexError,
                    OverflowError,  # hostile header dims overflow C ssize_t
                ):
                    feats.append(None)
                    ok.append(False)
                else:
                    feats.append(feature)
                    ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoded": ok,
                }
            )

    assert dim <= 64  # keep the Arrow batch row width bounded
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema)


def decode_audio(payload: bytes) -> tuple[object, int]:
    """Decode a PCM WAV payload to (samples float64 in [-1, 1] shaped
    (n, channels), sample_rate). REAL for 16-bit PCM RIFF/WAVE — header
    walk over chunks, then ``frombuffer`` — no audio libraries.
    Compressed codecs (mp3/aac/opus) raise at this seam."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAVE PCM decodes without codec libs")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM supported without codec libs")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return samples.reshape(-1, channels), rate


def audio_stats_features(media: DataFrame) -> DataFrame:
    """REAL audio features from decoded PCM: per-payload RMS level,
    peak, zero-crossing rate, duration seconds — the standard cheap
    descriptors a media pipeline computes before any model runs. Same
    corrupt-payload policy as :func:`image_stats_features`."""
    import numpy as np

    schema = (
        "media_id long, kind string, rms double, peak double, "
        "zero_cross_rate double, duration_s double, decoded boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("rms", "peak", "zcr", "dur", "ok")}
            for payload in pdf["payload"]:
                # compute ALL values before appending any: a payload
                # that decodes but then fails (empty data chunk -> max()
                # on empty, rate 0 -> ZeroDivisionError) must not leave
                # half-appended columns, which would misalign the Arrow
                # batch. TypeError covers NULL payloads.
                try:
                    samples, rate = decode_audio(bytes(payload))
                    mono = samples.mean(axis=1)
                    if len(mono) == 0 or rate <= 0:
                        raise ValueError("empty or rate-less audio")
                    vals = (
                        float(np.sqrt((mono**2).mean())),
                        float(np.abs(mono).max()),
                        float((np.diff(np.signbit(mono)) != 0).mean()),
                        len(mono) / rate,
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    TypeError,
                    ZeroDivisionError,
                    struct_error,
                    OverflowError,
                ):
                    vals = (None, None, None, None)
                    out["ok"].append(False)
                else:
                    out["ok"].append(True)
                for k, v in zip(("rms", "peak", "zcr", "dur"), vals):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "rms": out["rms"],
                    "peak": out["peak"],
                    "zero_cross_rate": out["zcr"],
                    "duration_s": out["dur"],
                    "decoded": out["ok"],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema)


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a learned embedding: bytes -> sha256
    stream -> dim floats in [-1, 1). Keeps the distributed plumbing and
    batch shapes real while the codec is stubbed."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        for i in range(0, 32, 4):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 4], "big")
            out.append((v / 2**32) * 2.0 - 1.0)
        counter += 1
    return out


def extract_features(media: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the shape a real image/audio encoder plugs into.
    Each batch is a pandas DataFrame; the UDF returns (media_id, kind,
    feature[FEATURE_DIM])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _fake_feature(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame
    timestamp, derived from meta.duration_ms — the decode itself is
    stubbed, the row explosion (the part that matters for partition
    sizing at scale) is real."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )


def payload_fingerprint(media: DataFrame) -> DataFrame:
    """Exact binary fingerprint (md5 of payload) — dedup key for media."""
    return media.select(
        "media_id", "kind", F.md5(F.col("payload")).alias("payload_fp")
    )


_RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
)


def resize_images(
    media: DataFrame, *, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize via Arrow-batched ``mapInPandas`` — the standard
    pre-processing step before a vision encoder.

    The real pixel work is STUBBED (no codec libs in this container):
    ``decode_image`` raises, and the fake path derives a deterministic
    payload of exactly ``width*height*3`` bytes from the source bytes via
    sha256 expansion, updating ``meta.width/height`` — so output schema,
    row sizes (the thing that matters for partition/memory sizing at
    scale), and batch shapes are all real. Swap the marked block for a
    PIL/torchvision resize on a real cluster.
    """
    target_len = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            out_meta = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                if p is None:
                    out_payload.append(None)
                    out_meta.append(m)
                    continue
                # --- STUB: real implementation decodes + resamples ---
                # img = decode_image(bytes(p)); img = img.resize((w, h))
                buf = bytearray()
                counter = 0
                src = bytes(p)
                while len(buf) < target_len:
                    buf += hashlib.sha256(
                        src + counter.to_bytes(4, "big")
                    ).digest()
                    counter += 1
                out_payload.append(bytes(buf[:target_len]))
                # ----------------------------------------------------
                meta = dict(m) if m is not None else {}
                meta["width"], meta["height"] = width, height
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=_RESIZED_SCHEMA
    )
