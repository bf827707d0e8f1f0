"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

For a 100 TB training pipeline the engine treats media as ``binary`` columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages. The Spark-side plumbing here — schemas, batch iteration, partition
sizing, UDF signatures — is real and tested. Codec status (r4):

- **BMP (24-bit uncompressed), PNG (non-interlaced 8-bit baseline, r5),
  baseline JPEG (r5, `functions/jpegcodec.py` — ITU-T T.81 sequential DCT,
  Annex K tables, numpy matrix DCT/IDCT, 4:2:0/4:2:2/4:4:4 decode) and
  WAV (PCM16) are REAL dependency-free codecs** (`decode_bmp`/`encode_bmp`,
  `decode_png`/`encode_png` — zlib inflate + all five scanline filters —
  `decode_jpeg`/`encode_jpeg`, `decode_wav`/`encode_wav`; stdlib
  struct/zlib + numpy): the default ``decode_fn`` sniffs magic bytes and
  decodes these end-to-end, and `resize_images` really resamples
  BMP/PNG/JPEG pixels (nearest neighbor) and re-encodes.
- Formats needing external libraries (opus/h264, progressive JPEG) remain
  STUBBED behind the deterministic fake — no media libs exist in this
  container. Swap ``decode_fn`` for a PIL/libav call in production;
  nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def _fake_decode(payload: bytes, meta) -> list[float]:
    """Deterministic stand-in for a real codec: 8 pseudo-features derived
    from a digest of the bytes. Replace with PIL/torchaudio/ffmpeg."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


# --------------------------------------------------------------- real codecs
# Dependency-free BMP (24-bit uncompressed) and WAV (PCM16) — the two classic
# formats whose containers are simple enough to parse with struct alone.


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit uncompressed bottom-up BMP bytes."""
    h, w, _ = px.shape
    row = (w * 3 + 3) & ~3
    data_size = row * h
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    buf = bytearray(hdr + info)
    bgr = px[::-1, :, ::-1]  # bottom-up row order, BGR channel order
    pad = bytes(row - w * 3)
    for r in bgr:
        buf += r.tobytes() + pad
    return bytes(buf)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes → (width, height, (h, w, 3) RGB uint8). 24-bit uncompressed
    only (top-down negative-height variant handled)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    _hsz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP is supported")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3
    arr = (
        np.frombuffer(payload, np.uint8, count=row * h, offset=off)
        .reshape(h, row)[:, : w * 3]
        .reshape(h, w, 3)
    )
    px = arr[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        px = px[::-1]
    return w, h, np.ascontiguousarray(px)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → non-interlaced 8-bit truecolor PNG bytes.

    Pure stdlib: zlib deflate + struct chunk framing (+ zlib.crc32). Rows
    use filter type 0 (None) — simple, always valid; compression still
    applies across the scanline stream.
    """
    import zlib

    h, w, _ = px.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB, no interlace
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → (width, height, (h, w, 3) RGB uint8).

    Pure stdlib + numpy: walks chunks, inflates the IDAT stream, and
    un-applies all five scanline filters (None/Sub/Up/Average/Paeth — the
    full non-interlaced baseline, not just what our encoder emits).
    Supports 8-bit gray (0), RGB (2) and RGBA (6); gray broadcasts to
    3 channels, alpha is dropped. Interlaced (Adam7) and palette images
    raise — they need no new dependencies, just aren't needed yet.
    """
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    color = depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in (0, 2, 6) or interlace != 0:
        raise ValueError("only non-interlaced 8-bit gray/RGB/RGBA PNG is supported")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream has the wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, r * (stride + 1) + 1).copy()
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-ch] → cumsum per lane
            rec = (
                np.cumsum(line.reshape(w, ch).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            rec = line + prev  # uint8 wraps = mod 256
        elif ft == 3:  # Average: sequential in x (left recon feeds right)
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return w, h, np.ascontiguousarray(px)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (channels, sample_rate, int16 sample array). PCM16 only;
    walks RIFF chunks so extra chunks (LIST, fact) don't break the parse."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 WAV is supported")
    return ch, rate, np.frombuffer(data, "<i2")


def real_decode(payload: bytes, meta) -> list[float]:
    """Default decode_fn: REAL decode for BMP/PNG/JPEG/WAV (magic-byte
    sniff), the deterministic fake for formats that need external codecs.

    Image features: [w, h, mean R/G/B, std, min, max] (pixel stats /255).
    WAV features: [n_samples, rate, mean, std, min, max, zero-crossings, rms]
    (sample stats /32768)."""
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpegcodec import decode_jpeg

        try:
            w, h, px = decode_jpeg(payload)
        except ValueError:  # progressive/12-bit etc: stubbed fallback
            return _fake_decode(payload, meta)
        f = px.reshape(-1, 3).astype(np.float64) / 255.0
        return [
            float(w), float(h),
            float(f[:, 0].mean()), float(f[:, 1].mean()), float(f[:, 2].mean()),
            float(f.std()), float(f.min()), float(f.max()),
        ]
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        w, h, px = decode_png(payload)
        f = px.reshape(-1, 3).astype(np.float64) / 255.0
        return [
            float(w), float(h),
            float(f[:, 0].mean()), float(f[:, 1].mean()), float(f[:, 2].mean()),
            float(f.std()), float(f.min()), float(f.max()),
        ]
    if payload[:2] == b"BM":
        w, h, px = decode_bmp(payload)
        f = px.reshape(-1, 3).astype(np.float64) / 255.0
        return [
            float(w), float(h),
            float(f[:, 0].mean()), float(f[:, 1].mean()), float(f[:, 2].mean()),
            float(f.std()), float(f.min()), float(f.max()),
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _ch, rate, s = decode_wav(payload)
        f = s.astype(np.float64) / 32768.0
        zc = int(np.count_nonzero(np.diff(np.signbit(f)))) if len(f) > 1 else 0
        return [
            float(len(s)), float(rate),
            float(f.mean()), float(f.std()), float(f.min()), float(f.max()),
            float(zc), float(np.sqrt((f * f).mean())) if len(f) else 0.0,
        ]
    return _fake_decode(payload, meta)


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, object], list[float]] | None = None,
    n_features: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    Batch shape notes for real codecs: media payloads are MBs, so the Arrow
    batch row-count must stay small (``batch_rows``) to bound worker memory;
    set spark.sql.execution.arrow.maxRecordsPerBatch accordingly or
    repartition so ~128MB of payload lands per task.
    """
    decode = decode_fn or real_decode
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [decode(p, m) for p, m in zip(chunk["payload"], chunk["meta"])]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "media_type": chunk["media_type"].values,
                        "features": feats,
                    }
                )

    return df.mapInPandas(_gen, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage.

    BMP, PNG and baseline-JPEG payloads are REALLY resampled (nearest neighbor, numpy
    index mapping) and re-encoded in their own format; other formats pass
    bytes through and only rewrite meta (codec stub — see module
    docstring). Plumbing (schema preservation, per-batch iteration) is
    shared by all paths.
    """
    out_schema = df.schema

    def _resize_one(payload: bytes) -> bytes:
        if payload[: len(_PNG_SIG)] == _PNG_SIG:
            _w, _h, px = decode_png(payload)
            enc = encode_png
        elif payload[:2] == b"BM":
            _w, _h, px = decode_bmp(payload)
            enc = encode_bmp
        elif payload[:2] == b"\xff\xd8":
            from ..functions.jpegcodec import decode_jpeg, encode_jpeg

            try:
                _w, _h, px = decode_jpeg(payload)
            except ValueError:
                return payload
            enc = encode_jpeg
        else:
            return payload  # no codec for this format: stubbed passthrough
        ys = (np.arange(height) * _h // height).clip(0, _h - 1)
        xs = (np.arange(width) * _w // width).clip(0, _w - 1)
        return enc(px[ys][:, xs])

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [_resize_one(p) for p in pdf["payload"]]
            pdf["meta"] = [
                {"width": width, "height": height, "duration_ms": m["duration_ms"] if m else None,
                 "codec": (m["codec"] if m else None)}
                for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(_gen, out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame (explode on a
    computed frame index — JVM-side; the decode of each frame is the stubbed
    feature stage above)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("doc_id", "media_type", "payload", "meta", "frame_ms")
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: image rows alternate REAL
    24-bit BMPs and REAL baseline JPEGs (16×12 random pixels), audio rows
    REAL PCM16 WAVs (8 kHz, 250 ms), video rows opaque bytes (codec
    stubbed)."""
    from ..functions.jpegcodec import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        if mt == "image":
            px = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
            payload = encode_bmp(px) if (i // 3) % 2 == 0 else encode_jpeg(px)
        elif mt == "audio":
            payload = encode_wav(
                rng.integers(-20000, 20000, size=2000, dtype=np.int16), rate=8000
            )
        else:
            payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            {
                "doc_id": f"m-{i:06d}",
                "media_type": mt,
                "payload": payload,
                "meta": {
                    "width": 16 if mt == "image" else None,
                    "height": 12 if mt == "image" else None,
                    "duration_ms": 250 if mt == "audio" else (3000 if mt == "video" else None),
                    "codec": (
                        ("bmp" if (i // 3) % 2 == 0 else "jpeg")
                        if mt == "image"
                        else {"audio": "wav", "video": "h264"}[mt]
                    ),
                },
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
