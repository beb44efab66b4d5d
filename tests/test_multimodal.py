"""Real-decode tests for the multimodal pipeline: BMP/PPM/WAV payloads
are generated AND decoded by pure-Python codecs, end-to-end through the
mapInPandas feature extractor (no external media libraries)."""

import math
import struct

import pytest

from duckdb_nsql_spark.operators import multimodal as mm


def test_bmp_roundtrip_exact_means():
    w, h, seed = 5, 4, 7
    payload = mm.make_bmp(w, h, seed)
    meta = mm.decode_image(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    # recompute expected channel means from the generator's formula; the
    # generator emits BGR rows (BMP convention): B=(v>>16), G=(v>>8), R=v
    tot = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            tot[0] += v & 0xFF
            tot[1] += (v >> 8) & 0xFF
            tot[2] += (v >> 16) & 0xFF
    n = w * h
    assert meta["mean_r"] == pytest.approx(tot[0] / n)
    assert meta["mean_g"] == pytest.approx(tot[1] / n)
    assert meta["mean_b"] == pytest.approx(tot[2] / n)


def test_ppm_roundtrip_exact_means():
    w, h, seed = 3, 6, 11
    payload = mm.make_ppm(w, h, seed)
    meta = mm.decode_image(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    tot = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            tot[0] += v & 0xFF
            tot[1] += (v >> 8) & 0xFF
            tot[2] += (v >> 16) & 0xFF
    n = w * h
    assert meta["mean_r"] == pytest.approx(tot[0] / n)


def test_wav_roundtrip_rate_frames_rms():
    n, seed, rate = 100, 3, 8000
    payload = mm.make_wav(n, seed, rate)
    meta = mm.decode_audio(payload)
    assert meta["n_channels"] == 1
    assert meta["framerate"] == rate
    assert meta["n_frames"] == n
    assert meta["duration_ms"] == int(n * 1000 / rate)
    freq = 200 + (seed % 17) * 50
    vals = [int(12000 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]
    expect_rms = math.sqrt(sum(v * v for v in vals) / n)
    assert meta["rms"] == pytest.approx(expect_rms)


def test_unknown_formats_raise_not_implemented():
    # progressive JPEG (SOF2) stays behind the codec seam
    with pytest.raises(NotImplementedError):
        mm.decode_image(
            b"\xff\xd8\xff\xc2\x00\x0b" + b"\x08\x00\x08\x00\x08\x01"
            b"\x01\x11\x00"
        )
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"GIF89a" + b"\x00" * 64)


def test_png_roundtrip_exact_means():
    # height 7 > 5 filter types: every unfilter path (None/Sub/Up/
    # Average/Paeth) runs at least once per image
    w, h, seed = 6, 7, 13
    payload = mm.make_png(w, h, seed)
    meta = mm.decode_image(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    tot = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            tot[0] += v & 0xFF
            tot[1] += (v >> 8) & 0xFF
            tot[2] += (v >> 16) & 0xFF
    n = w * h
    assert meta["mean_r"] == pytest.approx(tot[0] / n)
    assert meta["mean_g"] == pytest.approx(tot[1] / n)
    assert meta["mean_b"] == pytest.approx(tot[2] / n)


def test_png_crc_corruption_detected():
    payload = bytearray(mm.make_png(4, 4, seed=2))
    payload[-20] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        mm.decode_image(bytes(payload))


def test_png_gray_and_rgba_decode():
    import struct
    import zlib

    # hand-build a 2x2 8-bit grayscale PNG (color type 0), filter 0 rows
    raw = bytes([0, 10, 20]) + bytes([0, 30, 40])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )
    meta = mm.decode_image(png)
    assert (meta["width"], meta["height"]) == (2, 2)
    assert meta["mean_r"] == pytest.approx(25.0)
    assert meta["mean_r"] == meta["mean_g"] == meta["mean_b"]

    # 1x2 RGBA (color type 6): alpha ignored by the mean computation
    raw = bytes([0, 100, 150, 200, 255]) + bytes([0, 50, 50, 100, 0])
    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 6, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )
    meta = mm.decode_image(png)
    assert meta["mean_r"] == pytest.approx(75.0)
    assert meta["mean_g"] == pytest.approx(100.0)
    assert meta["mean_b"] == pytest.approx(150.0)


def test_pipeline_decodes_real_payloads(loaded_engine):
    docs = loaded_engine.table("documents").limit(40)
    assets = mm.synth_assets(loaded_engine.spark, docs)
    feats = mm.extract_features(assets).collect()
    assert len(feats) == 40
    assert all(r["decode_ok"] for r in feats), "real payloads must decode"
    for r in feats:
        if r["kind"] == "image":
            assert r["feat"][0] == pytest.approx(1.0)
            assert r["feat"][1] >= 3  # width
        else:
            assert r["feat"][0] == pytest.approx(2.0)
            assert r["feat"][2] == pytest.approx(8.0)  # 8 kHz
    # a corrupted payload flows through as decode_ok=False, not an error
    from pyspark.sql import functions as F

    bad = assets.limit(1).withColumn("payload", F.lit(b"\x00garbage"))
    row = mm.extract_features(bad).collect()[0]
    assert row["decode_ok"] is False
    assert len(row["feat"]) == 8


def test_jpeg_roundtrip_means_and_errors():
    """Baseline JPEG: encoder+decoder round-trip keeps channel means
    within quantization error on noise images; a solid-color image
    (DC-only blocks) decodes to near-exact means; truncated payloads
    raise instead of silently misdecoding."""
    import pytest as _pytest

    from duckdb_nsql_spark.operators import multimodal as mm

    for (w, h, seed) in [(16, 16, 1), (24, 17, 7), (33, 9, 3)]:
        payload = mm.make_jpeg(w, h, seed)
        out = mm._decode_jpeg(payload)
        assert (out["width"], out["height"]) == (w, h)
        tr = tg = tb = 0
        for y in range(h):
            for x in range(w):
                v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
                tr += v & 0xFF
                tg += (v >> 8) & 0xFF
                tb += (v >> 16) & 0xFF
        n = w * h
        assert abs(out["mean_r"] - tr / n) < 5
        assert abs(out["mean_g"] - tg / n) < 5
        assert abs(out["mean_b"] - tb / n) < 5
    # decode_image routes by SOI signature
    meta = mm.decode_image(mm.make_jpeg(8, 8, 5))
    assert meta["width"] == 8
    # truncated entropy data: loud error (decode_ok=False in the pipeline)
    with _pytest.raises(Exception):
        mm._decode_jpeg(mm.make_jpeg(16, 16, 1)[:40])


def test_image_neardup_lsh_guarantee(spark):
    """Banded hamming LSH: every pair at distance <= 1 MUST be found
    (pigeonhole: one of two bands is identical); found pairs never
    exceed the confirm threshold."""
    import pandas as pd

    from duckdb_nsql_spark.operators import multimodal

    hashes = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3, 4],
                "n_px": [8, 8, 8, 8],
                "ahash_bits": [
                    "10101010",  # base
                    "10101011",  # hamming 1 vs base -> must be found
                    "01010101",  # hamming 8 vs base -> must not
                    "10101010",  # identical -> hamming 0
                ],
            }
        )
    )
    rows = multimodal.image_neardup_pairs(hashes, max_hamming=2).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in rows}
    assert found[(1, 2)] == 1
    assert found[(1, 4)] == 0
    assert (1, 3) not in found
    for h in found.values():
        assert h <= 2


def test_image_neardup_hot_band_guard(spark):
    """Degenerate hash corpus (the blank-image / digital-silence case):
    many assets share one identical hash, so one (n_px, band, bandsig)
    key would fan the candidate join quadratically. The max_band guard
    is DEFAULT-ON; this pins (a) the default, (b) hot buckets dropped
    from candidate generation (bounded per-bucket join input), and
    (c) near-dup pairs outside the hot bucket still found."""
    import inspect

    import pandas as pd

    from duckdb_nsql_spark.operators import multimodal

    assert inspect.signature(multimodal.image_neardup_pairs).parameters[
        "max_band"
    ].default == 1000

    n_blank = 60
    ids = list(range(n_blank)) + [900, 901]
    bits = ["00000000"] * n_blank + ["10101010", "10101011"]
    hashes = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": ids, "n_px": [8] * len(ids), "ahash_bits": bits}
        )
    )

    cap = 16
    rows = multimodal.image_neardup_pairs(
        hashes, max_hamming=2, max_band=cap
    ).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in rows}
    # the blank block (60 > cap in BOTH bands) emits no pairs; the
    # distinct near-dup pair survives (its bands are cold)
    assert found == {(900, 901): 1}

    # bounded join input: replay the band key and check surviving
    # band-group sizes never exceed the cap
    from pyspark.sql import functions as F

    banded = hashes.select(
        "asset_id",
        "n_px",
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
        "asset_id", "n_px",
        F.col("band.b").alias("b"), F.col("band.bandsig").alias("bandsig"),
    )
    sizes = banded.groupBy("n_px", "b", "bandsig").count()
    assert sizes.agg(F.max("count")).first()[0] > cap  # degenerate indeed
    surviving = sizes.filter(F.col("count") <= cap)
    assert surviving.agg(F.max("count")).first()[0] <= cap
