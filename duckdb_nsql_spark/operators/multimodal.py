"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas pipelines.

The Spark-side architecture — schema contract, mapInPandas batch shape,
partition sizing — is the deliverable, and since round 4 the decode step
is REAL for container-friendly formats: BMP, P6-PPM and PNG images
(PNG via stdlib zlib: full chunk walk + all five scanline filters),
baseline-sequential JPEG (pure-Python Huffman + dequant + IDCT +
YCbCr->RGB, ITU-T T.81; encoder included so fixtures carry real
entropy-coded payloads) and RIFF/WAVE PCM audio — all decoded by
pure-Python parsers (no native codecs needed), producing real
width/height/pixel-mean and sample-rate/RMS features. Formats that
still need native codecs (progressive JPEG, MP3, video) raise
NotImplementedError behind the same seam — swap in PIL/ffmpeg on a
cluster that has them; nothing else changes.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# schema contract for a multimodal asset table
ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "asset_id bigint, kind string, n_bytes int, sha256_hex string, "
    "feat array<float>, decode_ok boolean"
)

_FEAT_DIM = 8


# --------------------------------------------------------------------------
# pure-Python encoders (deterministic synthetic payloads for the fixture)
# --------------------------------------------------------------------------


def make_bmp(width: int, height: int, seed: int) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER), deterministic pixels."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            row += bytes(((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))
        rows.append(bytes(row) + b"\x00" * pad)
    return header + b"".join(rows)


def make_ppm(width: int, height: int, seed: int) -> bytes:
    """Binary P6 PPM, deterministic pixels."""
    body = bytearray()
    for y in range(height):
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            body += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, seed: int) -> bytes:
    """8-bit RGB PNG, deterministic pixels (same formula as BMP/PPM).

    Scanline filters cycle through all five PNG filter types (None, Sub,
    Up, Average, Paeth) so the decoder's unfilter paths are all
    exercised by every multi-row fixture image."""
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            row += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
        rows.append(bytes(row))

    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y, row in enumerate(rows):
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2) & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            raw += bytes(
                (row[i] - _paeth(
                    row[i - bpp] if i >= bpp else 0,
                    prev[i],
                    prev[i - bpp] if i >= bpp else 0,
                )) & 0xFF
                for i in range(len(row))
            )
        prev = row

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_wav(n_samples: int, seed: int, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV: deterministic sine-ish tone."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        freq = 200 + (seed % 17) * 50
        samples = [
            int(12000 * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n_samples)
        ]
        w.writeframes(struct.pack(f"<{n_samples}h", *samples))
    return buf.getvalue()


# --------------------------------------------------------------------------
# pure-Python decoders (the real decode seam)
# --------------------------------------------------------------------------


def decode_image(payload: bytes) -> dict:
    """Decode a BMP or binary-PPM payload to
    ``{width, height, mean_r, mean_g, mean_b}``.

    Pure Python — no native codecs (PNG rides stdlib zlib). JPEG and
    friends raise NotImplementedError: install PIL on the cluster and
    extend this seam; the surrounding pipeline is codec-agnostic.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    raise NotImplementedError(
        "only BMP/PPM/PNG/baseline-JPEG decode in-container; other "
        "formats need PIL/opencv on the cluster — extend this seam, the "
        "pipeline is codec-agnostic"
    )


def _decode_bmp(b: bytes) -> dict:
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    hsize, width, height, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    tot = [0, 0, 0]
    for y in range(height):
        base = off + y * stride
        row = b[base : base + row_raw]
        # pixels are little-endian BGR
        tot[2] += sum(row[0::3])
        tot[1] += sum(row[1::3])
        tot[0] += sum(row[2::3])
    n = max(width * height, 1)
    return {
        "width": width,
        "height": height,
        "mean_r": tot[0] / n,
        "mean_g": tot[1] / n,
        "mean_b": tot[2] / n,
    }


def _ppm_raw(b: bytes) -> tuple[int, int, bytes]:
    """Parse a binary P6 PPM: (width, height, raw RGB triplets)."""
    # P6 <ws> width <ws> height <ws> maxval <single-ws> raw RGB
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        parts.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, _maxval = parts
    return width, height, b[i : i + width * height * 3]


def _decode_ppm(b: bytes) -> dict:
    width, height, raw = _ppm_raw(b)
    n = max(width * height, 1)
    return {
        "width": width,
        "height": height,
        "mean_r": sum(raw[0::3]) / n,
        "mean_g": sum(raw[1::3]) / n,
        "mean_b": sum(raw[2::3]) / n,
    }


def _decode_png(b: bytes) -> dict:
    """Full PNG decode for 8-bit gray / RGB / RGBA, non-interlaced:
    chunk walk (CRC-checked), concatenated-IDAT inflate, and all five
    scanline unfilters. Palette/16-bit/interlaced images raise
    NotImplementedError (rare in ML corpora; PIL path on a real
    cluster)."""
    i = len(_PNG_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while i + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, i + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0:
                raise NotImplementedError("only 8-bit non-palette PNG in-container")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported in-container")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise NotImplementedError("palette PNG not supported in-container")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("PNG pixel data truncated")
    tot = [0] * channels
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for k in range(channels, stride):
                line[k] = (line[k] + line[k - channels]) & 0xFF
        elif ftype == 2:  # Up
            for k in range(stride):
                line[k] = (line[k] + prev[k]) & 0xFF
        elif ftype == 3:  # Average
            for k in range(stride):
                left = line[k - channels] if k >= channels else 0
                line[k] = (line[k] + (left + prev[k]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for k in range(stride):
                left = line[k - channels] if k >= channels else 0
                ul = prev[k - channels] if k >= channels else 0
                line[k] = (line[k] + _paeth(left, prev[k], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        for c in range(channels):
            tot[c] += sum(line[c::channels])
        prev = line

    n = max(width * height, 1)
    means = [t / n for t in tot]
    if channels == 1:
        r = g = bl = means[0]
    elif channels == 2:
        r = g = bl = means[0]
    else:
        r, g, bl = means[0], means[1], means[2]
    return {"width": width, "height": height, "mean_r": r, "mean_g": g, "mean_b": bl}


def decode_audio(payload: bytes) -> dict:
    """Decode a RIFF/WAVE PCM payload to
    ``{n_channels, framerate, n_frames, duration_ms, rms}``.

    Pure Python (stdlib ``wave`` + struct). Compressed formats raise
    NotImplementedError — extend the seam with ffmpeg/librosa on the
    cluster.
    """
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decode in-container; mp3/ogg need "
            "ffmpeg/librosa on the cluster"
        )
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        frames = w.readframes(nframes)
    if sw != 2:
        raise NotImplementedError("only 16-bit PCM supported in-container")
    vals = struct.unpack(f"<{len(frames) // 2}h", frames)
    rms = math.sqrt(sum(v * v for v in vals) / max(len(vals), 1))
    return {
        "n_channels": nch,
        "framerate": rate,
        "n_frames": nframes,
        "duration_ms": int(nframes * 1000 / rate) if rate else 0,
        "rms": rms,
    }


def _features(kind: str, payload: bytes) -> tuple[list[float], bool]:
    """(feature vector, decode_ok). Real features from a real decode;
    deterministic sha1-derived fallback when the codec isn't available
    in-container (decode_ok=False distinguishes the two)."""
    try:
        if kind == "image":
            m = decode_image(payload)
            feat = [
                1.0, float(m["width"]), float(m["height"]),
                m["mean_r"] / 255.0, m["mean_g"] / 255.0, m["mean_b"] / 255.0,
                0.0, 0.0,
            ]
            return feat, True
        if kind == "audio":
            m = decode_audio(payload)
            feat = [
                2.0, float(m["n_channels"]), m["framerate"] / 1000.0,
                m["duration_ms"] / 1000.0, m["rms"] / 32768.0, 0.0, 0.0, 0.0,
            ]
            return feat, True
    except (NotImplementedError, ValueError, EOFError, wave.Error):
        pass
    digest = hashlib.sha1(payload).digest()
    return [b / 255.0 for b in digest[:_FEAT_DIM]], False


def synth_assets(spark, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a deterministic asset table from the documents fixture with
    REAL payloads: doc_ids ≡0 (mod 8) get a baseline 4:4:4 JPEG, other
    ≡0 (mod 4) a 24-bit BMP, ≡2 (mod 4) an 8-bit RGB PNG (zlib DEFLATE,
    filters cycling through all five types), ≡1 (mod 4) a P6 PPM,
    ≡3 (mod 4) a 16-bit PCM WAV — all generated by the pure-Python
    encoders above, so the decode path exercises real codec work
    end-to-end (no external libraries)."""

    @F.pandas_udf("binary")
    def payload_for(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            if i % 4 == 0:
                if i % 8 == 0:  # half the BMP class carries baseline JPEG
                    out.append(make_jpeg(8 + i % 9, 8 + i % 5, seed=i))
                else:
                    out.append(make_bmp(4 + i % 5, 3 + i % 3, seed=i))
            elif i % 4 == 2:
                out.append(make_png(4 + i % 5, 3 + i % 6, seed=i))
            elif i % 4 == 1:
                out.append(make_ppm(3 + i % 4, 2 + i % 5, seed=i))
            else:
                out.append(make_wav(64 + i % 64, seed=i))
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 4 == 3, "audio").otherwise("image").alias("kind"),
        payload_for(F.col("doc_id")).alias("payload"),
        F.when(F.col("doc_id") % 8 == 0, "image/jpeg")
        .when(F.col("doc_id") % 4 == 0, "image/bmp")
        .when(F.col("doc_id") % 4 == 2, "image/png")
        .when(F.col("doc_id") % 4 == 1, "image/x-portable-pixmap")
        .otherwise("audio/wav")
        .alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow ships each partition as pandas batches; decode runs per-batch.
    At 100 TB: repartition upstream so each task holds ~128 MB of
    payloads, and the stage is embarrassingly parallel — no shuffle, no
    driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                f_, ok = _features(kind, bytes(payload))
                feats.append(f_)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    # digest is sha256 over the UPPERCASE-HEX encoding of
                    # the payload (not the raw bytes): DuckDB v1.0's
                    # sha256() hashes VARCHAR only, so hashing hex(payload)
                    # lets a cross-engine oracle recompute the exact value
                    "sha256_hex": pdf["payload"].map(
                        lambda b: hashlib.sha256(
                            bytes(b).hex().upper().encode()
                        ).hexdigest()
                    ),
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp. Pure plan surgery (sequence+explode) — decoding the frame
    itself goes through the decode seam above."""
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("asset_id", "frame_ms", "payload")
    )


# --------------------------------------------------------------------------
# JPEG baseline codec (pure Python, ITU-T T.81 public spec; tables from
# the spec's Annex K examples). Decoder: SOF0 baseline sequential DCT,
# 8-bit, grayscale / YCbCr with any 1-4x sampling factors, restart
# markers. Encoder: 4:4:4 quality-75 used by synth_assets so the decode
# path exercises real Huffman + IDCT work with no external libraries.
# --------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 example quantization tables (natural order after dezigzag)
_JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_COS8 = [
    [
        math.cos((2 * x + 1) * u * math.pi / 16)
        * (math.sqrt(0.5) if u == 0 else 1.0)
        for u in range(8)
    ]
    for x in range(8)
]


def _huff_decode_map(bits: list, values: list) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _huff_encode_map(bits: list, values: list) -> dict:
    """{symbol: (code, length)} for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RST markers are handled by the caller via resync()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.buf |= 0 << (24 - self.nbits)  # pad with zeros
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # EOI or other marker
            else:
                self.pos += 1
            self.buf |= byte << (24 - self.nbits)
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        if self.nbits == 0:
            return 0
        bit = (self.buf >> 31) & 1
        self.buf = (self.buf << 1) & 0xFFFFFFFF
        self.nbits -= 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def resync(self) -> None:
        """Skip to just past the next RST marker, clearing the buffer."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_read(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t > 0 and v < (1 << (t - 1)) else v


def _idct_block(coef: list) -> list:
    """2D 8x8 inverse DCT; coef in natural order, returns 64 spatial
    samples (pre level-shift)."""
    tmp = [
        [sum(coef[v * 8 + u] * _COS8[x][u] for u in range(8)) for x in range(8)]
        for v in range(8)
    ]
    return [
        0.25 * sum(tmp[v][x] * _COS8[y][v] for v in range(8))
        for y in range(8)
        for x in range(8)
    ]


def _decode_jpeg(b: bytes) -> dict:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list] = {}
    huff: dict[tuple, dict] = {}
    restart = 0
    frame = None
    i = 2
    scan = None
    while i + 1 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        seglen = struct.unpack_from(">H", b, i)[0]
        seg = b[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                vals = []
                for _ in range(64):
                    if pq:
                        vals.append(struct.unpack_from(">H", seg, j)[0])
                        j += 2
                    else:
                        vals.append(seg[j])
                        j += 1
                nat = [0] * 64
                for k, z in enumerate(_ZIGZAG):
                    nat[z] = vals[k]
                qt[tq] = nat
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + c * 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _huff_decode_map(bits, vals)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tds = seg[1 + c * 2], seg[2 + c * 2]
                scomp.append({"cs": cs, "td": tds >> 4, "ta": tds & 0x0F})
            scan = (scomp, i + seglen)
            break
        i += seglen
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF0/SOS")
    scomp, data_pos = scan
    comps = frame["comps"]
    byid = {c["id"]: c for c in comps}
    for sc in scomp:
        c = byid[sc["cs"]]
        c["td"], c["ta"] = sc["td"], sc["ta"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        c["pw"] = mcux * c["h"] * 8
        c["ph"] = mcuy * c["v"] * 8
        planes[c["id"]] = [0.0] * (c["pw"] * c["ph"])
        c["dc"] = 0
    br = _BitReader(b, data_pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.resync()
                for c in comps:
                    c["dc"] = 0
            mcu_count += 1
            for c in comps:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _huff_read(br, huff[(0, c["td"])])
                        diff = _extend(br.read_bits(t), t)
                        c["dc"] += diff
                        coef = [0.0] * 64
                        coef[0] = c["dc"] * q[0]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, huff[(1, c["ta"])])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[_ZIGZAG[k]] = _extend(br.read_bits(s), s) * q[_ZIGZAG[k]]
                            k += 1
                        px = _idct_block(coef)
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane = planes[c["id"]]
                        pw = c["pw"]
                        for yy in range(8):
                            base = (oy + yy) * pw + ox
                            row = px[yy * 8 : yy * 8 + 8]
                            for xx in range(8):
                                plane[base + xx] = row[xx] + 128.0
    # component sample lookup with subsampling replication
    tot = [0.0, 0.0, 0.0]
    if len(comps) == 1:
        c = comps[0]
        plane = planes[c["id"]]
        for y in range(h):
            base = y * c["pw"]
            for x in range(w):
                v = min(max(plane[base + x], 0.0), 255.0)
                tot[0] += v
                tot[1] += v
                tot[2] += v
    else:
        cy, cb, cr = comps[0], comps[1], comps[2]
        py, pb, pr = planes[cy["id"]], planes[cb["id"]], planes[cr["id"]]
        for y in range(h):
            for x in range(w):
                yv = py[(y * cy["v"] // vmax) * cy["pw"] + (x * cy["h"] // hmax)]
                bv = pb[(y * cb["v"] // vmax) * cb["pw"] + (x * cb["h"] // hmax)] - 128.0
                rv = pr[(y * cr["v"] // vmax) * cr["pw"] + (x * cr["h"] // hmax)] - 128.0
                r = yv + 1.402 * rv
                g = yv - 0.344136 * bv - 0.714136 * rv
                bl = yv + 1.772 * bv
                tot[0] += min(max(r, 0.0), 255.0)
                tot[1] += min(max(g, 0.0), 255.0)
                tot[2] += min(max(bl, 0.0), 255.0)
    n = max(w * h, 1)
    return {
        "width": w,
        "height": h,
        "mean_r": tot[0] / n,
        "mean_g": tot[1] / n,
        "mean_b": tot[2] / n,
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _fdct_block(px: list) -> list:
    """Forward 8x8 DCT; px 64 samples 0..255, returns natural order."""
    s = [p - 128.0 for p in px]
    tmp = [
        [sum(s[y * 8 + x] * _COS8[y][v] for y in range(8)) for x in range(8)]
        for v in range(8)
    ]
    return [
        0.25 * sum(tmp[v][x] * _COS8[x][u] for x in range(8))
        for v in range(8)
        for u in range(8)
    ]


def _jpeg_cat(v: int) -> int:
    """JPEG magnitude category (bit length of |v|)."""
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


def make_jpeg(width: int, height: int, seed: int) -> bytes:
    """Baseline 4:4:4 JPEG with the deterministic pixel formula shared by
    the BMP/PNG/PPM fixtures; Annex K quantization + Huffman tables."""
    # pixel planes in YCbCr
    def rgb(x: int, y: int) -> tuple:
        v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
        return (v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF)

    mcux = (width + 7) // 8
    mcuy = (height + 7) // 8
    enc_dc = {
        0: _huff_encode_map(*_HUFF_DC_LUMA),
        1: _huff_encode_map(*_HUFF_DC_CHROMA),
    }
    enc_ac = {
        0: _huff_encode_map(*_HUFF_AC_LUMA),
        1: _huff_encode_map(*_HUFF_AC_CHROMA),
    }
    qts = {0: _JPEG_QT_LUMA, 1: _JPEG_QT_CHROMA}
    bw = _BitWriter()
    dcpred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            blocks = [[], [], []]
            for yy in range(8):
                for xx in range(8):
                    x = min(mx * 8 + xx, width - 1)
                    y = min(my * 8 + yy, height - 1)
                    r, g, b = rgb(x, y)
                    blocks[0].append(0.299 * r + 0.587 * g + 0.114 * b)
                    blocks[1].append(
                        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                    )
                    blocks[2].append(
                        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                    )
            for ci in range(3):
                tq = 0 if ci == 0 else 1
                q = qts[tq]
                coef = _fdct_block(blocks[ci])
                quant = [int(round(coef[z] / q[z])) for z in range(64)]
                zz = [quant[_ZIGZAG[k]] for k in range(64)]
                diff = zz[0] - dcpred[ci]
                dcpred[ci] = zz[0]
                t = _jpeg_cat(diff)
                code, ln = enc_dc[tq][t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = 0
                for k in range(63, 0, -1):
                    if zz[k]:
                        last_nz = k
                        break
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tq][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _jpeg_cat(zz[k])
                    code, ln = enc_ac[tq][(run << 4) | s]
                    bw.write(code, ln)
                    v = zz[k]
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[tq][0x00]  # EOB
                    bw.write(code, ln)
    data = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tq: int, tbl: list) -> bytes:
        zz = bytes(tbl[_ZIGZAG[k]] for k in range(64))
        return seg(0xDB, bytes([tq]) + zz)

    def dht(tc: int, th: int, table: tuple) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt(0, _JPEG_QT_LUMA)
        + dqt(1, _JPEG_QT_CHROMA)
        + sof
        + dht(0, 0, _HUFF_DC_LUMA)
        + dht(0, 1, _HUFF_DC_CHROMA)
        + dht(1, 0, _HUFF_AC_LUMA)
        + dht(1, 1, _HUFF_AC_CHROMA)
        + sos
        + data
        + b"\xff\xd9"
    )


def image_ahash(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual average-hash over DECODED image pixels — the
    image-side near-dup fingerprint (aHash family: a pixel's bit is set
    when its luma exceeds the image mean; visually identical images
    agree bit-for-bit, small edits flip few bits, so hamming distance
    over the hash is the image analogue of minhash similarity).

    Integer-exact by construction: luma = (r+g+b) // 3 and the
    threshold test luma * n_px > sum_luma is cross-multiplied integer
    arithmetic — no float mean, so the DuckDB oracle can recompute the
    identical bits straight from the exported payload BYTES, an
    independent pixel-level check on the decode path.

    Scale shape: mapInPandas over Arrow batches, map-only, no shuffle;
    the output is one narrow row per image (grid dims, luma sum, bit
    string). Binary-PPM payloads only (the raw-pixel format); other
    codecs route through decode_image first on a real cluster.
    """
    import pandas as pd

    cols = [id_col, "w", "h", "n_px", "sum_luma", "ahash_bits"]

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, raw = _ppm_raw(bytes(payload))
                n = w * h
                lumas = [
                    (raw[3 * k] + raw[3 * k + 1] + raw[3 * k + 2]) // 3
                    for k in range(n)
                ]
                s = sum(lumas)
                bits = "".join(
                    "1" if l * n > s else "0" for l in lumas
                )
                rows.append((int(aid), w, h, n, s, bits))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(
        fn,
        # sum_luma is bigint: 255 * n_px overflows int32 past ~8.4M px,
        # and this path is pitched as the GENERAL image near-dup hash.
        f"{id_col} long, w int, h int, n_px int, sum_luma bigint, "
        "ahash_bits string",
    )


def _wav_samples(payload: bytes) -> list[int]:
    """Decode mono 16-bit PCM WAV to signed sample values (real stdlib
    wave decode — the same path decode_audio uses)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        frames = w.readframes(w.getnframes())
    return list(struct.unpack(f"<{len(frames) // 2}h", frames))


def audio_fingerprint(
    assets: DataFrame,
    n_windows: int = 8,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio loudness-profile fingerprint — the audio-side near-dup
    sketch (chromaprint's shape at toy scale): samples bin into
    ``n_windows`` proportional windows (window of sample s =
    s·n_windows // n — integer exact); a window's bit is set when its
    absolute-amplitude sum exceeds its even share of the total
    (win_abs · n_windows > total_abs, cross-multiplied integers, no
    float). Two clips with the same loudness envelope collide; silence
    vs content always differs.

    Integer-exact end to end, so the DuckDB oracle recomputes the
    identical bits straight from the exported payload BYTES (PCM int16
    at the fixed 44-byte RIFF offset) — the audio counterpart of
    image_ahash's pixel-level decode check. mapInPandas, map-only.
    """
    cols = [id_col, "n_samples", "total_abs", "energy_bits"]

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                vals = _wav_samples(bytes(payload))
                n = len(vals)
                wins = [0] * n_windows
                for s, v in enumerate(vals):
                    wins[s * n_windows // n] += abs(v)
                tot = sum(wins)
                bits = "".join(
                    "1" if w * n_windows > tot else "0" for w in wins
                )
                rows.append((int(aid), n, tot, bits))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(
        fn,
        f"{id_col} long, n_samples int, total_abs bigint, "
        "energy_bits string",
    )


def image_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    id_col: str = "asset_id",
    max_band: int | None = 1000,
) -> DataFrame:
    """Image near-duplicate pairs by banded hamming blocking over the
    aHash bits (the image-side analogue of minhash-LSH): the bit string
    splits into two bands, candidates share (n_px, band, band bits) —
    by pigeonhole every pair at hamming distance <= 1 is guaranteed a
    colliding band, and distance-2 pairs collide unless their two flips
    straddle both bands (the standard LSH recall trade) — then the
    exact hamming distance confirms or rejects each candidate.

    No all-pairs stage: candidate generation is an equi-join on the
    band key; the per-position compare runs only on LSH survivors.
    Every expression (substring split, per-position filter count) has
    an exact DuckDB twin.

    ``max_band`` is the DEFAULT-ON hot-band guard (the stop-shingle
    guard's modality twin): a corpus with many identical hashes (blank
    images, digital silence) collapses onto one (n_px, band, bandsig)
    key and the candidate join goes quadratic in that bucket — AQE
    skew-join spreads the shuffle but not the pair count. Band keys
    with more than ``max_band`` members are dropped from candidate
    generation (the hot-key set is tiny — at most total/max_band keys —
    so it broadcasts into an anti-join). Members of a dropped bucket
    are by construction near-identical along that band; route them
    through the EXACT-hash dedup path (group by the full bit string →
    canonical id, linear output) instead of enumerating O(n²) pairs.
    Pass ``max_band=None`` for unguarded small-corpus semantics.
    """
    h = hashes.select(id_col, "n_px", "ahash_bits")
    half = F.expr("n_px div 2")
    banded = h.select(
        id_col,
        "n_px",
        "ahash_bits",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("b"),
                    F.expr("substring(ahash_bits, 1, n_px div 2)").alias(
                        "bandsig"
                    ),
                ),
                F.struct(
                    F.lit(1).alias("b"),
                    F.expr(
                        "substring(ahash_bits, n_px div 2 + 1,"
                        " n_px - n_px div 2)"
                    ).alias("bandsig"),
                ),
            )
        ).alias("band"),
    ).select(
        id_col, "n_px", "ahash_bits",
        F.col("band.b").alias("b"), F.col("band.bandsig").alias("bandsig"),
    )
    if max_band is not None:
        # persist the band derivation: with the guard on, the plan reads
        # `banded` three times (hot-key aggregate + both candidate join
        # sides) — without the cache each read re-derives the explode +
        # substring band signatures over the full hashes input
        from .dedup import _persist_small

        banded = _persist_small(banded)
        hot = (
            banded.groupBy("n_px", "b", "bandsig")
            .agg(F.count(F.lit(1)).alias("nb"))
            .filter(F.col("nb") > max_band)
            .select("n_px", "b", "bandsig")
        )
        banded = banded.join(
            F.broadcast(hot), ["n_px", "b", "bandsig"], "left_anti"
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), "n_px",
        F.col("ahash_bits").alias("ba"), "b", "bandsig",
    )
    bb = banded.select(
        F.col(id_col).alias("id_b"), F.col("n_px").alias("n_px_b"),
        F.col("ahash_bits").alias("bb"), F.col("b").alias("b_b"),
        F.col("bandsig").alias("bandsig_b"),
    )
    pairs = (
        a.join(
            bb,
            (a["n_px"] == bb["n_px_b"])
            & (a["b"] == bb["b_b"])
            & (a["bandsig"] == bb["bandsig_b"])
            & (a["id_a"] < bb["id_b"]),
        )
        .select("id_a", "id_b", "n_px", "ba", "bb")
        .distinct()
    )
    out = pairs.withColumn(
        "hamming",
        F.expr(
            "size(filter(sequence(1, n_px),"
            " i -> substring(ba, i, 1) <> substring(bb, i, 1)))"
        ).cast("int"),
    ).where(F.col("hamming") <= max_hamming)
    return out.select("id_a", "id_b", F.col("n_px").cast("int").alias("n_px"), "hamming")
