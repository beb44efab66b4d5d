"""Deterministic streaming-sketch operators: HyperLogLog distinct
counting, Count-Min frequency estimation, and histogram quantile
estimation.

These are the classic one-pass OLAP sketches a 100 TB pipeline uses
when exact answers are too expensive: cardinality of a vocabulary,
heavy-hitter terms, and approximate quantiles. Spark's built-ins
(approx_count_distinct, count_min_sketch, approx_percentile) are
engine-private — their estimates can't be replayed by another engine —
so these implementations derive every hash from md5 (byte-identical in
Spark and DuckDB) and keep all accumulation in exact integer
arithmetic, making the ESTIMATES themselves bit-reproducible and
hash-oracleable, not just the exact sides.

Scale design (all three):
- the only data-sized shuffle is the word/value aggregation itself;
  sketch state is tiny and bounded (64 registers x langs, 3x512
  counters, 64 bins) and reduces with partial aggregation map-side.
- no Python UDFs anywhere — md5/conv/bin/shiftleft are codegen'd
  JVM expressions.

Capability parity: the reference surfaces approx_count_distinct via
DuckDB (SURVEY §2 q42_approx_and_stats); these operators extend the
family to replayable sketches a training pipeline can audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# m = 64 registers; standard HLL bias constant alpha_64 = 0.709.
# The harmonic-mean denominator sum(2^-M_i) over 64 registers is kept
# EXACT by scaling with 2^33 (the max rho): each term 2^(33 - M_i) is an
# integer, the sum fits comfortably in a BIGINT (<= 64 * 2^33 < 2^40),
# and the final estimate is ONE double division on identical integers —
# IEEE-identical in both engines. The constant below is
# alpha * m^2 * 2^33 precomputed in Python so both engines parse the
# same double literal instead of re-folding a product.
HLL_M = 64
_HLL_RHO_CAP = 33  # 32-bit hash slice -> leading-zero count in [0, 32] + 1
HLL_NUMERATOR = repr(0.709 * HLL_M * HLL_M * float(1 << _HLL_RHO_CAP))


def hll_distinct(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group HyperLogLog distinct-word estimate next to the exact
    count — the cardinality audit run before sizing a vocabulary or a
    dedup pass.

    Register index = first 2 md5 hex chars mod 64; rho = leading-zero
    nibble-free bit count of the next 8 hex chars (an exact 32-bit
    slice via conv -> bin length). Small-range (linear-counting)
    correction applies when the raw estimate <= 2.5m and empty
    registers exist, with the one ln() rounded to 4 dp so a last-ulp
    libm difference cannot flip the oracle.
    """
    # the exploded word stream feeds BOTH the register table and the
    # exact audit side — without persistence each branch recomputes the
    # full scan+regex split (measured 13.9s -> ~4s at sf0.1). At real
    # scale the same holds: one materialization, two cheap aggregates.
    from pyspark.storagelevel import StorageLevel

    words = hll_words(df, group_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    regs = hll_cells(words, group_col).groupBy(group_col, "idx").agg(
        F.max("rho").alias("m")
    )
    exact = words.groupBy(group_col).agg(
        F.countDistinct("w").alias("exact_distinct"),
        F.count("*").alias("n_words"),
    )
    est = exact.join(hll_finalize(regs, group_col), group_col)
    return est.select(
        group_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        "registers_hit",
        "hll_estimate",
        F.round(
            (F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


def hll_words(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Word stream feeding the sketch — stateless, usable on a
    streaming DataFrame unchanged."""
    return df.select(
        group_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )


def hll_cells(words: DataFrame, group_col: str) -> DataFrame:
    """(group, register index, rho) cells — the map-only sketch update.
    Stateless, so the SAME expressions run over a stream; the register
    table is then just ``groupBy(group, idx).max(rho)``, an order- and
    duplication-insensitive aggregate (replays and retries cannot
    corrupt the sketch) whose state is bounded at |groups| x 64 cells
    however long the stream runs."""
    h = words.withColumn("h", F.md5("w"))
    v = F.conv(F.substring("h", 3, 8), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(_HLL_RHO_CAP)).otherwise(
        F.lit(_HLL_RHO_CAP) - F.length(F.bin(v))
    )
    return h.select(
        group_col,
        (F.conv(F.substring("h", 1, 2), 16, 10).cast("bigint") % HLL_M)
        .alias("idx"),
        rho.alias("rho"),
    )


def hll_finalize(regs: DataFrame, group_col: str) -> DataFrame:
    """Estimate from a (group, idx, m) register table (batch or the
    materialized state of a streaming aggregation): exact-integer
    harmonic sum, one IEEE division, linear-counting small-range
    correction with the single ln() rounded to 4 dp."""
    sums = regs.groupBy(group_col).agg(
        F.count("*").alias("hit"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_RHO_CAP} - m)"))
        .alias("s_num"),
    )
    s_total = F.col("s_num") + (F.lit(HLL_M) - F.col("hit")) * F.lit(
        1 << _HLL_RHO_CAP
    ).cast("bigint")
    raw = F.lit(float(HLL_NUMERATOR)).cast("double") / s_total
    zeros = F.lit(HLL_M) - F.col("hit")
    linear = F.round(
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros), 4
    )
    est = F.when((raw <= 2.5 * HLL_M) & (zeros > 0), linear).otherwise(
        F.round(raw, 4)
    )
    return sums.select(
        group_col,
        F.col("hit").cast("int").alias("registers_hit"),
        est.alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 512


def cms_bucket(j: int, col):
    """Row-j counter bucket for a word: md5('j:'||w)[1:8] hex -> int
    mod width. Byte-identical in DuckDB ('0x'||substr(...)::BIGINT)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )


def cms_cells(words: DataFrame) -> DataFrame:
    """(j, bucket) counter-update cells, 3 per word — stateless map, so
    the SAME expressions run over a stream; the counter table is then
    ``groupBy(j, bucket).count()``, an additive aggregate whose state is
    bounded at 3 x 512 cells however long the stream runs."""
    return words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(j, F.col("w")).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell")
    ).select(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))


def cms_heavy_hitters(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k heavy-hitter words with their Count-Min sketch estimates —
    the one-sided-error frequency audit (estimate >= exact always; the
    overestimate column shows collision inflation at this width).

    Sketch = 3 rows x 512 counters; row j hashes a word to bucket
    conv(md5('j:'||w)[1:8], 16) % 512. The counter table is 1,536 rows
    however large the corpus — it broadcast-joins back to the top-k
    probe set. Exact top-k tie-breaks (count desc, word asc) so the
    k-boundary is engine-identical.
    """
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w")
    )
    bucket = cms_bucket
    counters = cms_cells(words).groupBy("j", "bucket").agg(
        F.count("*").alias("c")
    )
    topk = (
        words.groupBy("w")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("w"))
        .limit(k)
    )
    probes = topk.select(
        "w",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("w")).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    est = (
        probes.join(
            F.broadcast(counters),
            (probes["cell.j"] == counters["j"])
            & (probes["cell.bucket"] == counters["bucket"]),
        )
        .groupBy("w", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        F.col("w").alias("word"),
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BINS = 64


def quantile_sketch(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    q: float = 0.5,
) -> DataFrame:
    """Per-group equi-width-histogram quantile estimate next to the
    exact quantile — the fixed-memory alternative to a full sort when
    only approximate percentiles are needed (64 bins per group, however
    many rows).

    Bin edges derive from the group's min/max (two tiny aggregates);
    the estimate interpolates linearly inside the bin containing the
    q-th rank. All rank/bin math is exact integer work; the single
    interpolation division is one double op on identical integers.
    Exact side = the inverted-CDF quantile (the value at row_number
    rank ceil(q*n)) computed with the SAME rank formula in both
    engines, so the comparison can never trip over an engine's private
    quantile rounding convention.
    """
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(group_col).agg(
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.count("*").alias("n"),
    )
    binned = (
        df.join(F.broadcast(bounds), group_col)
        .select(
            group_col,
            v.alias("val"),
            "lo",
            "hi",
            "n",
            F.least(
                F.floor(
                    (v - F.col("lo"))
                    * HIST_BINS
                    / (F.col("hi") - F.col("lo") + 1)
                ).cast("int"),
                F.lit(HIST_BINS - 1),
            ).alias("bin"),
        )
        .groupBy(group_col, "lo", "hi", "n", "bin")
        .agg(F.count("*").alias("bin_n"))
    )
    w = Window.partitionBy(group_col).orderBy("bin")
    cum = binned.withColumn("cum", F.sum("bin_n").over(w))
    rank = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
    hit = cum.where(
        (F.col("cum") >= rank) & (F.col("cum") - F.col("bin_n") < rank)
    )
    width = (F.col("hi") - F.col("lo") + 1) / HIST_BINS
    frac = (rank - (F.col("cum") - F.col("bin_n"))) / F.col("bin_n")
    est = F.round(F.col("lo") + width * (F.col("bin") + frac), 4)
    w2 = Window.partitionBy(group_col).orderBy(v)
    exact = (
        df.join(F.broadcast(bounds.select(group_col, "n")), group_col)
        .select(
            group_col,
            v.alias("exact_val"),
            "n",
            F.row_number().over(w2).alias("rn"),
        )
        .where(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"))
        .select(group_col, F.col("exact_val").alias("exact_q"))
    )
    return (
        hit.select(group_col, F.col("n").cast("long").alias("n"), est.alias("est_q"))
        .join(exact, group_col)
        .select(
            group_col,
            "n",
            F.col("exact_q").cast("double").alias("exact_q"),
            "est_q",
            F.round(
                F.abs(F.col("est_q") - F.col("exact_q"))
                / F.greatest(F.col("exact_q"), F.lit(1.0)),
                4,
            ).alias("rel_error"),
        )
    )


def column_ndv_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column NDV (distinct-count) profile of a table: exact NDV
    next to the HLL estimate for each requested column — the ANALYZE /
    optimizer-statistics collection pass, run as ONE scan however many
    columns are profiled (columns stack to (column, value) rows
    map-side; the sketch then reuses the shared register algebra).

    Values are profiled as their string rendering (cast to string is
    engine-identical for the string/integer columns this targets);
    NULLs are excluded, matching optimizer NDV convention.
    """
    stack_expr = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    stacked = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (col_name, w)"
    ).where(F.col("w").isNotNull())
    regs = hll_cells(stacked, "col_name").groupBy("col_name", "idx").agg(
        F.max("rho").alias("m")
    )
    exact = stacked.groupBy("col_name").agg(
        F.countDistinct("w").alias("exact_ndv"),
        F.count("*").alias("n_rows"),
    )
    est = exact.join(hll_finalize(regs, "col_name"), "col_name")
    return est.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("exact_ndv").cast("long").alias("exact_ndv"),
        "registers_hit",
        "hll_estimate",
        F.round(
            (F.col("hll_estimate") - F.col("exact_ndv"))
            / F.col("exact_ndv"),
            4,
        ).alias("rel_error"),
    )
