"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas pipelines.

The Spark-side architecture — schema contract, mapInPandas batch shape,
partition sizing — is the deliverable, and since round 4 the decode step
is REAL for container-friendly formats: BMP, P6-PPM and PNG images
(PNG via stdlib zlib: full chunk walk + all five scanline filters) and
RIFF/WAVE PCM audio are decoded by pure-Python parsers (no native
codecs needed), producing real width/height/pixel-mean and
sample-rate/RMS features. Formats that need native codecs
(JPEG/MP3/video) still raise NotImplementedError behind the same seam —
swap in PIL/ffmpeg on a cluster that has them; nothing else changes.
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
    "asset_id bigint, kind string, n_bytes int, sha1 string, "
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
    raise NotImplementedError(
        "only BMP/PPM/PNG decode in-container; JPEG needs PIL/opencv on "
        "the cluster — extend this seam, the pipeline is codec-agnostic"
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


def _decode_ppm(b: bytes) -> dict:
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
    raw = b[i : i + width * height * 3]
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
    REAL payloads: doc_ids ≡0 (mod 4) get a 24-bit BMP, ≡2 (mod 4) an
    8-bit RGB PNG (zlib DEFLATE, filters cycling through all five
    types), ≡1 (mod 4) a P6 PPM, ≡3 (mod 4) a 16-bit PCM WAV — all
    generated by the pure-Python encoders above, so the decode path
    exercises real codec work end-to-end (no external libraries)."""

    @F.pandas_udf("binary")
    def payload_for(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            if i % 4 == 0:
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
        F.when(F.col("doc_id") % 4 == 0, "image/bmp")
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
                    "sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(bytes(b)).hexdigest()
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
