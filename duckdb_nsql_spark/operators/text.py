"""Text-analysis operators for large-scale training-data pipelines.

All of these are pure built-in-function column pipelines (JVM-side,
whole-stage codegen, no Python UDFs) — they scale linearly with no
shuffle; at 100 TB they are map-only passes over the documents table.

Designed to be cross-checkable against DuckDB: every expression uses
functions with identical semantics in both engines (md5, regexp_*,
length, split), so the driver's oracle comparison can hash-match values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# word-splitting regex shared by all operators (and mirrored in oracle SQL)
WORD_SPLIT_RE = r"\s+"

# tiny per-language stopword markers for the n-gram language heuristic;
# chosen to be unambiguous across the three languages
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-space symbols — a cheap stand-in for a real tokenizer's pre-split
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(col: Column) -> Column:
    """Canonical form used for fingerprinting and exact dedup:
    lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized text).

    md5 is byte-identical in Spark and DuckDB, so fingerprints computed by
    either engine agree — this is what makes the dedup operators
    oracle-checkable.
    """
    return F.md5(normalize_text(col))


def word_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), WORD_SPLIT_RE))


def token_count_bpe(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenization regex.
    regexp_count skips materializing the match array (count-only)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 4)


def upper_ratio(col: Column) -> Column:
    n_upper = F.length(col) - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    return F.round(n_upper / F.greatest(F.length(col), F.lit(1)), 4)


def stopword_ratio(col: Column) -> Column:
    """Fraction of words that are (english) stopwords — quality signal."""
    stops = F.regexp_count(F.lower(col), F.lit(LANG_MARKERS["en"]))
    return F.round(stops / F.greatest(word_count(col), F.lit(1)), 4)


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: longer docs with low punctuation
    noise and a natural stopword rate score higher. Deterministic
    arithmetic only, reproducible in ANSI SQL."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 4)


def lang_id(col: Column) -> Column:
    """n-gram-marker language heuristic over {en, de, fr}; 'und' = unknown.

    Ties break by marker order (en > de > fr) via strictly-greater
    comparisons, matching the oracle SQL's CASE ordering.
    """
    low = F.lower(col)
    scores = {
        lang: F.regexp_count(low, F.lit(rx))
        for lang, rx in LANG_MARKERS.items()
    }
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


# fixed weights of the quality classifier (hand-set, fastText-style
# quality-proxy stage — the plumbing is the point, not the training);
# listed in tie-break order for the `reason` output
QC_FEATURES = (
    ("len", 0.20),
    ("words", 0.15),
    ("word_len", 0.15),
    ("stopwords", 0.25),
    ("digits", 0.10),
    ("punct", 0.15),
)
QC_DECISION = 0.55


def quality_classifier(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality filtering: a fixed-weight linear classifier
    over interpretable features, with a decision boundary and a
    per-document ``reason`` (the weakest weighted feature) — the
    classifier-filter stage of a training-data pipeline (CCNet/Gopher
    style), distinct from the unsupervised quality_score heuristic.

    Map-only JVM built-ins, no UDFs, no shuffle at any scale. All
    feature math is RATIONAL arithmetic (+, *, /, least/greatest/abs) —
    deliberately no exp/ln/sigmoid, whose last-ulp libm behavior could
    diverge between the JVM and the DuckDB oracle; with identical
    operand order both engines produce bit-identical doubles, so the
    rounded score and the keep decision are exactly cross-checkable.
    """
    c = F.col(text_col)
    nc = F.length(c)
    wc = word_count(c)
    f_len = F.least(nc / F.lit(2000.0), F.lit(1.0))
    f_words = F.least(wc / F.lit(300.0), F.lit(1.0))
    mean_wl = nc / F.greatest(wc, F.lit(1))
    f_wl = F.lit(1.0) - F.least(
        F.abs(mean_wl - F.lit(5.5)) / F.lit(5.5), F.lit(1.0)
    )
    stops = F.regexp_count(F.lower(c), F.lit(LANG_MARKERS["en"]))
    f_stop = F.least(
        stops * F.lit(3.0) / F.greatest(wc, F.lit(1)), F.lit(1.0)
    )
    digits = F.regexp_count(c, F.lit("[0-9]"))
    f_digit = F.lit(1.0) - F.least(
        digits * F.lit(4.0) / F.greatest(nc, F.lit(1)), F.lit(1.0)
    )
    f_punct = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    feats = dict(
        len=f_len, words=f_words, word_len=f_wl,
        stopwords=f_stop, digits=f_digit, punct=f_punct,
    )
    contribs = [
        (name, F.lit(w) * feats[name]) for name, w in QC_FEATURES
    ]
    score = contribs[0][1]
    for _, contrib in contribs[1:]:
        score = score + contrib
    score = F.round(score, 4)
    weakest = F.least(*[contrib for _, contrib in contribs])
    reason = F.when(contribs[0][1] == weakest, F.lit(contribs[0][0]))
    for name, contrib in contribs[1:]:
        reason = reason.when(contrib == weakest, F.lit(name))
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(QC_DECISION)).alias("keep"),
        reason.alias("reason"),
    )


def fingerprint_sketch(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """k-min document fingerprint sketch: the ``k`` lexicographically
    smallest md5 digests of the document's word 3-gram shingles.

    This is the min-hash/winnowing family of document fingerprints (two
    documents' sketch overlap estimates their shingle containment);
    md5 stands in for a rolling hash so the sketch is byte-identical in
    DuckDB and the driver can cross-check it. Map-only — no shuffle at
    any scale; the sketch column is what a near-dup index would join on.
    """
    from .dedup import shingles

    c = F.col(text_col)
    hx = F.array_sort(F.transform(shingles(c), lambda s: F.md5(s)))
    return df.select(
        F.col(id_col),
        F.array_join(F.slice(hx, 1, k), ",").alias("fp_sketch"),
        F.size(hx).alias("n_shingles"),
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass profile of a documents table: counts, ratios, quality,
    language, fingerprint. Map-only — no shuffle at any scale."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        word_count(c).alias("n_words"),
        token_count_bpe(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        upper_ratio(c).alias("upper_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def ngram_hashes(col: Column, n: int) -> Column:
    """Distinct md5 hashes of the word n-grams of normalized text.

    Documents shorter than ``n`` words contribute no grams. md5 over the
    space-joined window is byte-identical in DuckDB, which is what makes
    decontamination oracle-checkable cross-engine."""
    words = F.split(normalize_text(col), WORD_SPLIT_RE)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.md5(F.array_join(F.slice(words, i, n), " ")),
    )
    # sequence(1, k) with k < 1 counts DOWNWARDS in Spark — guard short docs
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation set (the standard n-gram-overlap
    decontamination used for LLM training corpora).

    Plan shape at 100 TB: the eval set is benchmark-sized (thousands of
    documents), so its distinct gram hashes BROADCAST; the training side
    is one map-only scan (normalize -> gram hashes -> explode) plus a
    broadcast left join, then ONE shuffle to aggregate per-document hit
    counts. No shuffle ever carries the corpus text itself — only
    (doc_id, 32-byte hash) pairs for grams, and explode_outer keeps
    gram-less (short) documents in the result with n_hits = 0.
    """
    eval_grams = (
        eval_set.select(
            F.explode(ngram_hashes(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = train.select(
        F.col(id_col),
        F.explode_outer(ngram_hashes(F.col(text_col), n)).alias("g"),
    )
    from pyspark.sql.functions import broadcast

    return (
        exploded.join(broadcast(eval_grams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.countDistinct(
                F.when(F.col("__hit").isNotNull(), F.col("g"))
            )
            .cast("int")
            .alias("n_hits")
        )
        .select(
            id_col,
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


# PII redaction patterns — ASCII-only constructs with identical semantics
# in Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
# Replacement order matters: the earlier pattern must not leave text the
# later ones would half-match.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub common PII shapes from a text column and count per-category
    redactions. Pure built-in regexp work: map-only, codegen'd, zero
    shuffles — a linear pass at any corpus size, with an exact DuckDB
    twin (regexp_replace 'g' + regexp_extract_all)."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl.replace("$", "\\$"))
    return df.select(F.col(id_col), clean.alias("clean_text"), *counts)


def chunk_documents(
    df: DataFrame,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size word-window chunks with overlap —
    the standard training/RAG corpus preparation step.

    Chunk i covers words [(i-1)*stride + 1, (i-1)*stride + chunk_words]
    with stride = chunk_words - overlap; the last chunk may be short; a
    document shorter than one chunk yields exactly one chunk. Pure
    built-in column work (split -> sequence -> posexplode -> slice ->
    join): map-only, zero shuffles, codegen'd — a linear pass at any
    scale, and every expression has an exact DuckDB twin for the oracle.
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    stride = chunk_words - overlap
    words = F.split(F.trim(F.col(text_col)), WORD_SPLIT_RE)
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    out = (
        df.withColumn("__words", words)
        .withColumn("__n_chunks", n_chunks)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__n_chunks")),
                    lambda i: F.array_join(
                        F.slice(
                            F.col("__words"),
                            (i - 1) * stride + 1,
                            chunk_words,
                        ),
                        " ",
                    ),
                )
            ).alias("__pos", "chunk_text"),
        )
        .select(
            id_col,
            (F.col("__pos") + 1).alias("chunk_id"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), WORD_SPLIT_RE)).alias(
                "chunk_words"
            ),
        )
    )
    return out


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword search over a document corpus — top-k by Robertson/
    Sparck-Jones BM25 with the standard +1 idf smoothing.

    Scale design: the corpus is scanned exactly twice and never shuffled.
    Pass 1 computes per-doc length and per-query-term tf as map-only
    codegen'd expressions (``size(filter(tokens, x -> x = term))`` — the
    query's handful of terms means no inverted-index explode is needed);
    a single tiny aggregate reduces (N, avgdl, df_t) to ONE row, which
    broadcast-crossJoins back for pass 2's scoring. Output is a
    TakeOrderedAndProject top-k. Ranking uses round(score, 6) with doc-id
    tiebreak so the k-boundary is deterministic across engines; every
    expression mirrors the DuckDB oracle text exactly (workload.py
    ORACLE_TEXT_BM25).
    """
    terms = [t.lower() for t in query_terms]
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    def tf_col(term: str):
        # NB: a `lambda x, t=term:` default-arg closure would make PySpark
        # see a TWO-parameter lambda and bind (element, index) instead
        return F.size(F.filter(tokens, lambda x: x == term))

    base = df.select(
        id_col,
        F.size(tokens).alias("dl"),
        *[tf_col(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        part = F.expr(
            f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
            f" * tf{i} * {k1 + 1}"
            f" / (tf{i} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        )
        score = part if score is None else score + part
    out = (
        scored.where(
            " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
        )
        .select(id_col, F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
    return out


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct-word
    ratio (map-only), top-unigram share and top-bigram share (the
    fraction of all words / word-bigrams taken by the most frequent one
    — boilerplate and degenerate repetition push these up).

    Scale design: the distinct ratio is a codegen'd array expression with
    zero shuffles; the top-share signals explode to (doc, gram) and
    aggregate twice on doc-id-keyed shuffles — high-cardinality keys, no
    skew (a document's grams all hash to the same reducer only for that
    document). Every expression mirrors the DuckDB oracle
    (ORACLE_TEXT_REPETITION) exactly.
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    base = df.select(
        id_col,
        tokens.alias("toks"),
        F.size(tokens).alias("n_words"),
        F.size(F.array_distinct(tokens)).alias("n_distinct"),
    ).where(F.col("n_words") > 0)
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    grams = base.select(
        id_col,
        F.explode(
            F.concat(
                F.transform("toks", lambda x: F.concat(F.lit("1:"), x)),
                F.transform(bigrams, lambda x: F.concat(F.lit("2:"), x)),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").count()
    tops = counts.groupBy(id_col).agg(
        F.max(
            F.when(F.col("gram").startswith("1:"), F.col("count"))
        ).alias("top1"),
        F.max(
            F.when(F.col("gram").startswith("2:"), F.col("count"))
        ).alias("top2"),
    )
    out = base.join(tops, id_col).select(
        id_col,
        F.round(F.col("n_distinct") / F.col("n_words"), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.col("top1") / F.col("n_words"), 4).alias(
            "top_unigram_share"
        ),
        F.round(
            F.coalesce(F.col("top2"), F.lit(0))
            / F.greatest(F.col("n_words") - 1, F.lit(1)),
            4,
        ).alias("top_bigram_share"),
    )
    return out


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style unigram language-model scoring: build the corpus
    unigram distribution, then score each document by its average word
    log-probability — the classic cheap quality/perplexity proxy for
    training-data filtering (low scores = out-of-distribution text).

    Scale design: one shuffle keyed by word builds the vocab counts
    (high cardinality, skew bounded by natural language's Zipf tail +
    AQE); the corpus total reduces to ONE broadcast row; scoring joins
    words→logprob on the word key and aggregates per doc_id. Word
    log-probs are rounded to 6 digits and summed as DECIMAL(12,6) —
    exact, order-independent addition — so the distributed partial sums
    hash-match DuckDB's sequential evaluation bit-for-bit (same
    discipline as the q65 window-frame fix)."""
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    words = df.select(id_col, F.explode(tokens).alias("w"))
    vocab = words.groupBy("w").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.round(F.log(F.col("c") / F.col("t")), 6)
        .cast("decimal(12,6)")
        .alias("lp"),
    )
    return (
        words.join(lp, "w")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum("lp").cast("double") / F.count("*"), 4
            ).alias("avg_logprob"),
            F.count("*").cast("int").alias("n_words"),
        )
    )


def dup_chunk_profile(
    df: DataFrame,
    chunk_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate-chunk ratio — the corpus-hygiene signal
    behind paragraph-level dedup (Gopher/RefinedWeb drop or down-weight
    documents whose chunks recur across the corpus; boilerplate and
    mirrored pages light up here long before full-document dedup fires).

    Documents split into NON-overlapping windows of ``chunk_words``
    lowercased words; a chunk is *duplicated* when the identical chunk
    text occurs in more than one document. Output per document:
    ``n_chunks``, ``dup_chunks`` (chunk occurrences whose text appears
    in >1 doc), and ``dup_ratio``.

    Scale design: chunks reduce to md5 fingerprints immediately (16
    bytes per chunk shuffles, never the text), then two balanced
    shuffles keyed by the high-cardinality fingerprint — the same shape
    as exact dedup, no skew hot-spots, no driver state. The per-doc
    aggregate reuses the (doc, hash) grouping, so the join back is
    hash-to-hash.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), WORD_SPLIT_RE)
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int"),
        F.lit(1),
    )
    chunks = (
        df.withColumn("__w", words)
        .withColumn("__nc", n_chunks)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nc")),
                    lambda i: F.md5(
                        F.array_join(
                            F.slice(
                                F.col("__w"),
                                (i - 1) * chunk_words + 1,
                                chunk_words,
                            ),
                            " ",
                        )
                    ),
                )
            ).alias("h"),
        )
    )
    doc_h = chunks.groupBy(id_col, "h").agg(F.count("*").alias("occ"))
    docs_per_h = doc_h.groupBy("h").agg(F.count("*").alias("nd"))
    return (
        doc_h.join(docs_per_h, "h")
        .groupBy(id_col)
        .agg(
            F.sum("occ").cast("int").alias("n_chunks"),
            F.sum(F.when(F.col("nd") > 1, F.col("occ")).otherwise(F.lit(0)))
            .cast("int")
            .alias("dup_chunks"),
            F.round(
                F.sum(
                    F.when(F.col("nd") > 1, F.col("occ")).otherwise(F.lit(0))
                )
                / F.sum("occ"),
                4,
            ).alias("dup_ratio"),
        )
    )


def token_histogram(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language token-length distribution: doc counts, exact discrete
    quantiles (p25/p50/p75/p90) of per-document word counts, and the
    mean — the first chart anyone draws before choosing sequence
    lengths / packing targets for a training corpus.

    Scale design: Spark's exact ``percentile`` buffers every value per
    group — a non-starter at corpus scale. Word counts are small
    integers, so the exact quantile comes from a two-level aggregate
    instead: count per (lang, word_count) — a bounded-cardinality
    relation of a few thousand rows regardless of corpus size — then a
    cumulative window over that tiny relation picks the smallest word
    count whose running count reaches ceil(q*n) (the standard discrete
    quantile). Heavy data is touched exactly once, map-only.
    """
    wc = F.size(F.split(F.trim(F.col(text_col)), WORD_SPLIT_RE))
    counts = (
        df.select(F.col(lang_col).alias("lang"), wc.alias("wc"))
        .groupBy("lang", "wc")
        .agg(F.count("*").alias("c"))
    )
    w_cum = Window.partitionBy("lang").orderBy("wc")
    w_tot = Window.partitionBy("lang")
    cum = counts.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "tot", F.sum("c").over(w_tot)
    )
    def q(p: float, name: str):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(p) * F.col("tot")), F.col("wc")
            )
        ).cast("int").alias(name)
    return cum.groupBy("lang").agg(
        F.max("tot").cast("int").alias("n_docs"),
        q(0.25, "p25"),
        q(0.50, "p50"),
        q(0.75, "p75"),
        q(0.90, "p90"),
        F.round(F.sum(F.col("wc") * F.col("c")) / F.max("tot"), 4).alias(
            "avg_words"
        ),
    )


# C4 line-filter rules (Raffel et al., "Exploring the Limits of Transfer
# Learning" §2.2): terminal punctuation, minimum words per line, no curly
# brace (code), no boilerplate markers. Shared with the oracle SQL.
C4_TERMINAL_RE = r'[.!?]"?$'
C4_BOILER_RE = r"lorem ipsum|javascript"
C4_MIN_WORDS = 5
C4_MIN_KEEP_LINES = 3


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = C4_MIN_WORDS,
    min_keep_lines: int = C4_MIN_KEEP_LINES,
) -> DataFrame:
    """C4-style rule-based line cleaning — the first filter stage of the
    C4/mC4 web-corpus pipeline: keep only lines that end in terminal
    punctuation, have at least ``min_words`` words, contain no curly
    brace (code markers) and no boilerplate phrases ("lorem ipsum",
    "javascript"); drop whole documents with fewer than
    ``min_keep_lines`` surviving lines.

    Output per document: total/kept line counts, per-rule failure
    counts (a line can fail several rules — counts are independent),
    the cleaned text as an md5 fingerprint, and the document-level
    ``keep_doc`` verdict.

    Scale design: map-only JVM built-ins over the line array (split +
    array filter/size lambdas), zero shuffles at any corpus size —
    the text never leaves its partition and only fixed-width counters
    plus one md5 come out.
    """
    low_boiler = C4_BOILER_RE
    lines = F.split(F.col(text_col), r"\n")

    def wc(x: Column) -> Column:
        return F.size(F.split(F.trim(x), WORD_SPLIT_RE))

    def ok_punct(x: Column) -> Column:
        return x.rlike(C4_TERMINAL_RE)

    def ok_words(x: Column) -> Column:
        return wc(x) >= min_words

    def ok_brace(x: Column) -> Column:
        return ~x.contains("{")

    def ok_boiler(x: Column) -> Column:
        return ~F.lower(x).rlike(low_boiler)

    kept = F.filter(
        lines,
        lambda x: ok_punct(x) & ok_words(x) & ok_brace(x) & ok_boiler(x),
    )
    n_kept = F.size(kept)

    def n_fail(pred) -> Column:
        return F.size(F.filter(lines, lambda x: ~pred(x))).cast("int")

    return df.select(
        id_col,
        F.size(lines).cast("int").alias("n_lines"),
        n_fail(ok_punct).alias("fail_punct"),
        n_fail(ok_words).alias("fail_short"),
        n_fail(ok_brace).alias("fail_brace"),
        n_fail(ok_boiler).alias("fail_boiler"),
        n_kept.cast("int").alias("kept_lines"),
        (n_kept >= min_keep_lines).alias("keep_doc"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
    )


# URL canonicalization: tracking parameters stripped before params sort
URL_TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for web-corpus dedup: lowercase scheme
    and host, strip a scheme-default port (:80/:443) and a leading
    ``www.``, strip trailing slashes from the path (empty path becomes
    ``/``), drop the fragment, drop tracking query parameters
    (utm_*/ref/fbclid/gclid) and sort the survivors.

    Pure built-in regexp/array expressions with identical semantics in
    DuckDB (regexp_extract returns '' on no match in both engines), so
    canonical forms computed by either engine agree byte-for-byte.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, r"&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("ref=")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup over a crawled corpus: group by canonical URL,
    keeping the lowest document id per group — the fetch-dedup stage
    that runs before any content-based dedup in a web pipeline.

    Output per canonical URL: occurrence count, distinct raw-spelling
    count, and the surviving doc id.

    Scale design: canonicalization is map-only; the exact distinct-
    spelling count is an explicit two-level aggregate — partial counts
    per (canon_url, raw url) shuffle once on the pair key, then the
    per-canon rollup shuffles already-deduped rows — instead of
    Spark's Expand-based ``countDistinct`` rewrite (one fewer
    exchange, and every aggregate is partial-aggregatable map-side, so
    a viral URL duplicated millions of times combines before the
    shuffle instead of hot-spotting one reducer).
    """
    canon = df.select(
        F.col(id_col),
        F.col(url_col),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    per_spelling = canon.groupBy("canon_url", url_col).agg(
        F.count("*").alias("c"), F.min(id_col).alias("m")
    )
    return per_spelling.groupBy("canon_url").agg(
        F.sum("c").cast("int").alias("n_urls"),
        F.count("*").cast("int").alias("n_variants"),
        F.min("m").alias("keep_doc"),
    )


# Bloom decontamination defaults: 4096 bits x 3 hashes keeps the
# false-positive rate ~(1-e^(-3n/4096))^3 (< 1% up to ~500 eval grams)
# while the whole filter is one broadcastable integer array
BLOOM_M_BITS = 4096
BLOOM_K_HASHES = 3


def _bloom_pos(col: Column, j: int, m_bits: int) -> Column:
    """Bloom hash j of a gram FINGERPRINT: grams arrive as md5 hex
    strings (ngram_hashes), so position j is the j-th disjoint
    8-hex-char slice reinterpreted as an integer mod the bit count —
    three independent 32-bit hashes with ZERO additional hashing on
    the corpus side (a salted re-md5 per (gram, j) was the dominant
    cost: ~3 extra md5s per gram, measured 3x the operator at sf1).
    Byte-identical in DuckDB. k_hashes*8 must fit the 32 hex chars."""
    assert (j + 1) * 8 <= 32
    return (
        F.conv(F.substring(col, j * 8 + 1, 8), 16, 10).cast("bigint")
        % m_bits
    )


def _bloom_bitstring(pset: Column, m_bits: int) -> Column:
    """Render a set-bit position array as an m_bits-char '0'/'1' string
    — the filter's wire form. Built once on a 1-row relation; probes
    against it are O(1) substr lookups."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_bits - 1)),
            lambda i: F.when(
                F.array_contains(pset, i.cast("bigint")), F.lit("1")
            ).otherwise(F.lit("0")),
        ),
        "",
    )


def _bloom_probe(bits: Column, gram: Column, j: int, m_bits: int) -> Column:
    """O(1) membership probe: is hash j's bit set for this gram?"""
    return (
        bits.substr(
            (_bloom_pos(gram, j, m_bits) + 1).cast("int"), F.lit(1)
        )
        == "1"
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter n-gram decontamination — the fixed-memory variant of
    :func:`decontaminate` for when the eval set's exact gram-hash set
    outgrows a broadcast: the filter is ``m_bits`` bits regardless of
    eval size, at the cost of a bounded, deterministic false-positive
    rate (a gram "hits" when all ``k_hashes`` positions are set, so a
    clean doc can flag, a contaminated one never misses — exactly the
    conservative direction decontamination wants).

    Plan shape at 100 TB: the eval side reduces to ONE row holding the
    filter as an actual BIT ARRAY (an m_bits-char '0'/'1' string),
    broadcast-crossJoined into a map-only corpus scan (the same
    1-row-stats pattern BM25 uses); each probe is an O(1) substr — a
    sorted-set representation was measured 2x slower at sf1 because
    array_contains scans the whole set per (gram, hash). The only
    shuffle is the per-document hit aggregate over (doc_id, 32-byte
    gram hash) pairs. Positions are md5-hex slices, so the DuckDB
    oracle replays bit positions exactly.
    """
    from pyspark.sql.functions import broadcast

    eval_bits = (
        eval_set.select(F.explode(ngram_hashes(F.col(text_col), n)).alias("g"))
        .select(
            F.explode(
                F.array(*[_bloom_pos(F.col("g"), j, m_bits)
                          for j in range(k_hashes)])
            ).alias("p")
        )
        .agg(F.collect_set("p").alias("__pset"))
        .select(_bloom_bitstring(F.col("__pset"), m_bits).alias("__bits"))
    )
    grams = train.select(
        F.col(id_col),
        F.explode_outer(ngram_hashes(F.col(text_col), n)).alias("g"),
    )
    hit = F.lit(True)
    for j in range(k_hashes):
        hit = hit & _bloom_probe(
            F.col("__bits"), F.col("g"), j, m_bits
        )
    # ngram_hashes is array_distinct per doc, so plain count/sum equal
    # countDistinct here — and skip Spark's distinct-aggregate rewrite,
    # keeping the corpus side to ONE exchange (plan-pinned)
    return (
        grams.crossJoin(broadcast(eval_bits))
        .groupBy(id_col)
        .agg(
            F.count("g").cast("int").alias("n_grams"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("int").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("flagged"),
        )
    )


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff — the observability report a
    rolling ingest pipeline publishes per refresh: per ``group_col``,
    how many documents were added / removed / kept between two corpus
    snapshots (membership by normalized-content fingerprint, so a
    re-crawled byte-identical page is 'kept' even when its id changed),
    plus the character-volume drift.

    Scale shape: both snapshots reduce to (fingerprint, group, chars)
    before the full-outer join on the high-cardinality fingerprint —
    text never shuffles; the report aggregate is a |groups|-row result.
    Duplicate fingerprints within a snapshot collapse to min(group) /
    min(chars) — deterministic (dropDuplicates would keep an arbitrary
    row) and replayable in the oracle.
    """
    def fps(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                fingerprint(F.col(text_col)).alias("fp"),
                F.col(group_col).alias("g"),
                F.length(text_col).alias("chars"),
            )
            .groupBy("fp")
            .agg(
                F.min("g").alias(f"{side}_g"),
                F.min("chars").alias(f"{side}_chars"),
            )
        )

    a = fps(old_df, "old")
    b = fps(new_df, "new")
    j = a.join(b, "fp", "full_outer")
    status = (
        F.when(F.col("old_g").isNull(), F.lit("added"))
        .when(F.col("new_g").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    g = F.coalesce(F.col("new_g"), F.col("old_g"))
    return (
        j.select(
            g.alias(group_col),
            status.alias("status"),
            F.coalesce(F.col("new_chars"), F.lit(0)).alias("nc"),
            F.coalesce(F.col("old_chars"), F.lit(0)).alias("oc"),
        )
        .groupBy(group_col, "status")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            (F.sum("nc") - F.sum("oc")).cast("bigint").alias("char_drift"),
        )
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — one rung
    up from :func:`unigram_logprob` toward the KenLM/CCNet perplexity
    filter: a corpus-trained conditional model p(w2|w1) scores each
    document by its average bigram log-probability. Word-salad text
    with plausible unigrams but improbable transitions (the failure
    mode unigram scoring cannot see) scores low here.

    Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), V = |unigram
    vocabulary| — the textbook Laplace estimate, chosen because every
    term is an exact integer aggregate both engines compute
    identically.

    Scale design: bigram counts are ONE shuffle keyed by the bigram
    (high-cardinality, Zipf-bounded skew like the unigram path);
    context counts c(w1,·) derive from the bigram counts by a second
    bounded aggregate (|vocab| rows); V reduces to one broadcast row.
    Scoring joins doc bigrams → model on the bigram key (the model is
    corpus-sized — NO broadcast assumed) and aggregates per doc.
    Determinism: log-probs round to 6 dp and sum as DECIMAL(12,6) —
    exact order-independent addition, same discipline as
    unigram_logprob, so distributed partials hash-match DuckDB.
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    toks = df.select(id_col, tokens.alias("t")).filter(F.size("t") >= 2)
    bi = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.concat(
                        F.element_at(F.col("t"), i),
                        F.lit(" "),
                        F.element_at(F.col("t"), i + 1),
                    ).alias("bg"),
                ),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    c2 = bi.groupBy("bg").agg(
        F.first("w1").alias("w1"), F.count("*").alias("c2")
    )
    c1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        df.select(F.explode(tokens).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    model = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.round(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))), 6
            )
            .cast("decimal(12,6)")
            .alias("lp"),
        )
    )
    return (
        bi.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.round(F.sum("lp").cast("double") / F.count("*"), 4).alias(
                "avg_bigram_logprob"
            ),
            F.count("*").cast("int").alias("n_bigrams"),
        )
    )


# Gopher rule battery (Rae et al. 2021, table A1 shape) — hand-pinned
# thresholds; rational/count arithmetic only so both engines agree bit
# for bit. Word bounds are scaled to the synthetic corpus (its docs are
# short); the rule ALGEBRA is the reference's.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_WL_LO = 2.0
GOPHER_WL_HI = 10.0
GOPHER_SYMBOL_MAX = 0.1
GOPHER_ALPHA_MIN = 0.8
GOPHER_STOPSET = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPS = 2


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style document-level rule filter — the third filter family
    next to c4_clean (line rules) and quality_classifier (linear
    score): hard per-document gates on word count, mean word length,
    symbol-to-word ratio (# and ...), alphabetic-word ratio, and
    distinct-stopword presence. Emits every metric plus per-rule flags
    plus the conjunction — the audit row a curation pipeline keeps even
    for dropped documents.

    Map-only JVM built-ins over the word array; integer counts and one
    guarded division per ratio (identical operand order on both
    engines), so the DuckDB oracle matches bit-for-bit. No shuffle at
    any scale.
    """
    c = F.col(text_col)
    words = F.split(F.trim(c), WORD_SPLIT_RE)
    n_words = F.size(words)
    n_alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    mean_wl = F.round(
        n_alpha_chars / F.greatest(n_words, F.lit(1)).cast("double"), 4
    )
    n_symbols = F.regexp_count(c, F.lit(r"#|\.\.\.")).cast("int")
    symbol_ratio = F.round(
        n_symbols / F.greatest(n_words, F.lit(1)).cast("double"), 4
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_ratio = F.round(
        n_alpha_words / F.greatest(n_words, F.lit(1)).cast("double"), 4
    )
    low = F.lower(c)
    stop_hits = sum(
        (
            F.when(low.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
            for w in GOPHER_STOPSET
        ),
        F.lit(0),
    ).cast("int")
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_wl = (mean_wl >= GOPHER_WL_LO) & (mean_wl <= GOPHER_WL_HI)
    r_symbol = symbol_ratio < GOPHER_SYMBOL_MAX
    r_alpha = alpha_ratio > GOPHER_ALPHA_MIN
    r_stops = stop_hits >= GOPHER_MIN_STOPS
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        r_words.alias("pass_words"),
        r_wl.alias("pass_word_len"),
        r_symbol.alias("pass_symbols"),
        r_alpha.alias("pass_alpha"),
        r_stops.alias("pass_stops"),
        (r_words & r_wl & r_symbol & r_alpha & r_stops).alias("keep"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-language tokenizer FERTILITY report: tokens-per-word and
    chars-per-token under the BPE-ish pre-tokenizer — the standard
    check that a tokenizer prices every language fairly before fixing a
    domain mix (a language with 2× fertility pays 2× the context budget
    per word; XLM-R/mC4 rebalance on exactly this number).

    One bounded aggregate keyed by language (|langs| rows out, however
    large the corpus); all sums are exact integer counts, ratios are
    one rounded division each — bit-identical on the DuckDB oracle.
    """
    c = F.col(text_col)
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.length(c).alias("nc"),
        word_count(c).alias("nw"),
        token_count_bpe(c).alias("nt"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.round(
            F.sum("nt") / F.greatest(F.sum("nw"), F.lit(1)).cast("double"), 4
        ).alias("fertility"),
        F.round(
            F.sum("nc") / F.greatest(F.sum("nt"), F.lit(1)).cast("double"), 4
        ).alias("chars_per_token"),
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the metadata-enrichment
    step of a curation pipeline (search facets, topic routing, cluster
    labeling all consume exactly this relation).

    idf = ln(N/df) rounded to 6 dp and carried as DECIMAL(12,6); the
    score tf·idf is an exact integer×decimal product, so ranking ties
    and boundaries resolve identically on both engines (ties break on
    the term ascending). Scale shape: one (doc,term) tf aggregate, one
    term-keyed document-frequency aggregate (the model — corpus-sized,
    NO broadcast assumed), a join on the term key, and one per-doc
    top-k window. All shuffle keys are high-cardinality terms/ids.
    """
    from pyspark.sql import Window

    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    words = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("w"))
    tf = words.groupBy("id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "w",
        F.round(F.log(F.col("n") / F.col("df")), 6)
        .cast("decimal(12,6)")
        .alias("idf"),
    )
    scored = tf.join(idf, "w").select(
        "id", "w", (F.col("tf") * F.col("idf")).alias("score")
    )
    win = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("w").alias("term"),
            F.round(F.col("score").cast("double"), 4).alias("tfidf"),
            "rank",
        )
    )


def ngram_novelty(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct 3-word shingles whose FIRST corpus occurrence (by doc id —
    the ingest order) is this document. The dedup-aware curation
    signal: a late document full of already-seen shingles adds little
    training value even when no single pair crosses a dedup threshold
    (the keep-first counterpart of dup_chunk_profile's symmetric
    ratio).

    Scale shape: shingles reduce to their text key; first-owner is ONE
    min-aggregate keyed by the shingle (high-cardinality), joined back
    on the same key (one exchange, reused), then a doc-keyed count —
    no window over the corpus, no global sort.
    """
    from .dedup import shingles

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col))).alias("g"),
    )
    first_owner = grams.groupBy("g").agg(F.min("id").alias("first_id"))
    return (
        grams.join(first_owner, "g")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum(
                F.when(F.col("id") == F.col("first_id"), 1).otherwise(0)
            )
            .cast("int")
            .alias("novel_grams"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "novel_grams",
            F.round(
                F.col("novel_grams")
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                4,
            ).alias("novelty"),
        )
    )


def kanon_release(
    df: DataFrame,
    quasi_cols: tuple[str, ...] = ("lang", "source"),
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """k-anonymity release gate over quasi-identifier columns: a row is
    releasable only when at least ``k`` rows share its full
    quasi-identifier combination — the privacy floor a corpus release
    applies to its metadata columns before publication (a (lang,
    source) combination seen once identifies its contributor). Emits
    every row with its group size and the release verdict, so the
    suppressed remainder is auditable rather than silently dropped.

    One aggregate keyed by the quasi-identifier tuple + one join back
    on the same key (exchange reused) — |groups| bounded by the
    quasi-identifier domain however large the corpus.
    """
    qcols = [F.col(c) for c in quasi_cols]
    sizes = df.groupBy(*qcols).agg(F.count("*").cast("int").alias("group_n"))
    return (
        df.select(id_col, *quasi_cols)
        .join(sizes, list(quasi_cols))
        .select(
            id_col,
            *quasi_cols,
            "group_n",
            (F.col("group_n") >= k).alias("released"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprinting
    scheme): hash every ``k``-word shingle, slide a window of ``w``
    consecutive positions, and record the window minimum — guaranteeing
    any shared run of ``k + w - 1`` words between two documents shares
    at least one selected fingerprint, at ~2/(w+1) the density of the
    full shingle set.

    Emits per document the shingle count, selected-fingerprint count,
    density, and an order-independent content checksum of the selected
    set (md5 of the sorted fingerprint list) — the compact sketch a
    plagiarism / near-dup index stores instead of full shingles.
    Documents with fewer than ``k + w - 1`` words have no full window
    and are excluded (both engines apply the same floor).

    Scale: the shingle hash array is a map-only codegen'd expression;
    the only shuffles are the doc-keyed window (high-cardinality key,
    no skew) and the per-doc aggregate that reuses its partitioning.
    Every expression (md5, slice, window min) has an exact DuckDB twin.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    base = df.select(id_col, toks.alias("toks")).where(
        F.size(F.col("toks")) >= k + w - 1
    )
    grams = base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                lambda i: F.md5(F.array_join(F.slice("toks", i, k), " ")),
            )
        ).alias("pos", "h"),
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    selected = (
        grams.withColumn("winmin", F.min("h").over(win))
        .where(F.col("pos") >= w - 1)
        .select(id_col, "winmin")
    )
    n_grams = grams.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_grams")
    )
    fps = selected.groupBy(id_col).agg(
        F.countDistinct("winmin").cast("int").alias("n_fingerprints"),
        F.md5(
            F.array_join(F.array_sort(F.collect_set("winmin")), "")
        ).alias("fingerprint_md5"),
    )
    return (
        n_grams.join(fps, id_col)
        .select(
            id_col,
            "n_grams",
            "n_fingerprints",
            F.round(F.col("n_fingerprints") / F.col("n_grams"), 4).alias(
                "density"
            ),
            "fingerprint_md5",
        )
    )


def doc_retrieval(
    df: DataFrame,
    query_terms: list[str],
    k: int = 5,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Composed retrieval convenience: chunk the corpus into overlapping
    word windows, BM25-rank the CHUNKS against the query, return the
    top-k chunks with their text — the chunk->rank->return shape of the
    reference's documentation retriever (``eval/doc_retriever.py:39-94``
    chunks markdown then ranks chunks for prompt augmentation; this is
    the same pipeline with BM25 in place of its embedding ranker,
    composing two already-oracled operators).

    The chunk corpus flows through :func:`bm25_topk` unchanged via a
    synthesized chunk key (doc_id * 100000 + chunk_id — documents
    beyond 100k chunks, i.e. ~5M words, would need a wider key); the
    top-k join back to chunk text is a k-row broadcast.
    """
    chunks = chunk_documents(
        df, chunk_words, overlap, text_col=text_col, id_col=id_col
    )
    ckeyed = chunks.select(
        (F.col(id_col) * 100000 + F.col("chunk_id")).alias("ckey"),
        "chunk_text",
    )
    top = bm25_topk(
        ckeyed, query_terms, k=k, text_col="chunk_text", id_col="ckey"
    )
    return (
        F.broadcast(top)
        .join(ckeyed, "ckey")
        .select(
            F.floor(F.col("ckey") / 100000).cast("long").alias(id_col),
            (F.col("ckey") % 100000).cast("int").alias("chunk_id"),
            "bm25",
            "chunk_text",
        )
    )


def doc_retrieval_embed(
    df: DataFrame,
    query_terms: list[str],
    k: int = 5,
    dim: int = 16,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedding-ranked retrieval: chunk the corpus, embed each chunk,
    rank chunks by cosine against the query embedding, return the top-k
    with text — the EXACT ranking shape of the reference's doc retriever
    (``eval/doc_retriever.py:60-94`` ranks markdown chunks by OpenAI
    embedding dot product; this swaps in a deterministic hashed
    bag-of-words embedding so the pipeline is replayable cross-engine,
    next to :func:`doc_retrieval`'s BM25 variant).

    The embedding is a ``dim``-bucket token histogram (bucket =
    md5(token) mod dim — both engines share md5, so the oracle rebuilds
    identical vectors); counts are exact small integers, so dot products
    and norms are exact in IEEE double regardless of summation order
    and the 4-dp rounded cosine can never split Spark from DuckDB. The
    query vector is a plan literal (broadcast by construction); ranking
    is a TakeOrderedAndProject — top-k per partition then a driver
    merge, never a global sort; the text join-back broadcasts k rows.
    """
    import hashlib

    chunks = chunk_documents(
        df, chunk_words, overlap, text_col=text_col, id_col=id_col
    )
    ckeyed = chunks.select(
        (F.col(id_col) * 100000 + F.col("chunk_id")).alias("ckey"),
        "chunk_text",
    )
    toks = F.filter(
        F.split(F.lower(F.col("chunk_text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    bkts = F.transform(
        toks,
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
            % F.lit(dim)
        ),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(bkts, lambda x: x == b)).cast("double"),
    )
    qv = [0.0] * dim
    for t in query_terms:
        h = int(hashlib.md5(t.lower().encode()).hexdigest()[:4], 16)
        qv[h % dim] += 1.0
    q = F.array(*[F.lit(v) for v in qv])

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    qn2 = sum(v * v for v in qv)
    # gate on the raw dot product, NOT the rounded cosine: an empty chunk
    # yields 0/0 = NaN, and NaN > 0 is FALSE on Spark but TRUE on DuckDB
    # (NaN sorts greatest there) — dot > 0 implies both norms > 0, so no
    # NaN ever reaches the comparison on either engine
    scored = (
        ckeyed.select(
            "ckey",
            "chunk_text",
            dot(vec, q).alias("__dq"),
            vec.alias("__v"),
        )
        .where(F.col("__dq") > 0)
        .select(
            "ckey",
            "chunk_text",
            F.round(
                F.col("__dq")
                / (
                    F.sqrt(dot(F.col("__v"), F.col("__v")))
                    * F.sqrt(F.lit(float(qn2)))
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    top = scored.orderBy(F.desc("cos_sim"), F.col("ckey")).limit(k)
    return top.select(
        F.floor(F.col("ckey") / 100000).cast("long").alias(id_col),
        (F.col("ckey") % 100000).cast("int").alias("chunk_id"),
        "cos_sim",
        "chunk_text",
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per group against a corpus-derived
    vocabulary (top ``vocab_size`` words by global frequency, word-asc
    tie-break) — the coverage check run before fixing a tokenizer or
    embedding vocabulary on a new corpus slice.

    The vocabulary is |vocab_size| rows at any corpus size — it
    broadcast-joins to the token stream; the only data-sized shuffles
    are the two word aggregates. Deterministic top-k boundary and exact
    integer rates make every value oracle-replayable.
    """
    words = df.select(
        group_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(vocab_size)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    tagged = words.join(F.broadcast(vocab), "w", "left")
    return (
        tagged.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            group_col,
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def dataset_card(
    df: DataFrame, group_col: str = "lang", text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-card summary per group — the datasheet table a corpus
    release publishes: document and character counts, average length,
    exact-duplicate share. All integer sums plus one final division per
    ratio, so every value replays exactly on the oracle.

    Two shuffles regardless of corpus size: the fingerprint aggregate
    (dup detection) and the group rollup; the fingerprint join is keyed
    on the md5 (uniform, no skew).
    """
    per_doc = df.select(
        group_col,
        fingerprint(F.col(text_col)).alias("__fp"),
        F.length(text_col).alias("__nc"),
        word_count(F.col(text_col)).alias("__wc"),
    )
    dup = per_doc.groupBy("__fp").agg(F.count("*").alias("__n"))
    tagged = per_doc.join(dup, "__fp").select(
        group_col,
        "__nc",
        "__wc",
        (F.col("__n") > 1).cast("int").alias("__is_dup"),
    )
    return tagged.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__nc").cast("long").alias("total_chars"),
        F.round(F.sum("__wc") / F.count("*"), 2).alias("avg_words"),
        F.sum("__is_dup").cast("long").alias("n_dup_docs"),
        F.round(F.sum("__is_dup") / F.count("*"), 4).alias("dup_rate"),
    )


def contamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Eval-side contamination report — the REVERSE direction of
    :func:`decontaminate`: per benchmark document, how many of its word
    n-grams leak into the training corpus and how many distinct
    training documents carry them. decontaminate tells you which TRAIN
    docs to drop; this tells you which EVAL items are compromised (and
    how badly) when the corpus can't change.

    Scale shape: gram-keyed inverted-index equi-join — the train side
    is the big one so nothing broadcasts; both sides reduce to
    (id, 32-byte gram hash) pairs before the shuffle, and the eval-side
    rollup reuses the eval-id partitioning. Short eval docs stay in the
    report with zero grams (explode_outer).
    """
    eval_g = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.explode_outer(ngram_hashes(F.col(text_col), n)).alias("g"),
    )
    train_g = (
        train.select(
            F.col(id_col).alias("train_id"),
            F.explode(ngram_hashes(F.col(text_col), n)).alias("g"),
        )
        .distinct()
    )
    joined = eval_g.join(train_g, "g", "left")
    return (
        joined.groupBy("eval_id")
        .agg(
            F.countDistinct("g").cast("int").alias("n_grams"),
            F.countDistinct(
                F.when(F.col("train_id").isNotNull(), F.col("g"))
            )
            .cast("int")
            .alias("n_hit_grams"),
            F.countDistinct("train_id").cast("int").alias("n_train_docs"),
        )
        .select(
            "eval_id",
            "n_grams",
            "n_hit_grams",
            "n_train_docs",
            F.round(
                F.col("n_hit_grams")
                / F.greatest(F.col("n_grams"), F.lit(1)),
                4,
            ).alias("leak_share"),
        )
    )


def langid_confusion(
    df: DataFrame, true_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Language-ID confusion matrix: the corpus's labeled language
    against the n-gram-marker heuristic's prediction — the evaluation
    artifact that tells you where the cheap classifier is trustworthy
    before gating ingest on it. One aggregate keyed on the (true, pred)
    pair + a |langs|-bounded window for the per-class share.
    """
    p = df.select(
        F.col(true_col).alias("true_lang"),
        lang_id(F.col(text_col)).alias("pred_lang"),
    )
    c = p.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("true_lang")
    return c.select(
        "true_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("share"),
    )


def winnow_matches(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing-index matching (the MOSS usage of the fingerprints):
    document pairs sharing at least ``min_shared`` selected
    fingerprints, with the share of each side's fingerprint set that
    matched — local plagiarism/near-dup detection at winnowed density
    (~2/(w+1) of the full shingle index).

    Inverted-index join keyed on the fingerprint (never all-pairs);
    per-doc set sizes ride along the explode, same diet as
    ngram_jaccard. Selected fingerprints come from the SAME window-min
    construction as :func:`winnow_fingerprints`, so the coverage
    guarantee carries over: any shared run of k + w - 1 words yields a
    shared fingerprint and therefore a candidate pair.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    base = df.select(id_col, toks.alias("toks")).where(
        F.size(F.col("toks")) >= k + w - 1
    )
    grams = base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                lambda i: F.md5(F.array_join(F.slice("toks", i, k), " ")),
            )
        ).alias("pos", "h"),
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    selected = (
        grams.withColumn("winmin", F.min("h").over(win))
        .where(F.col("pos") >= w - 1)
        .select(F.col(id_col).alias("doc_id"), F.col("winmin").alias("fp"))
        .distinct()
    )
    sized = selected.join(
        selected.groupBy("doc_id").agg(F.count("*").alias("sz")), "doc_id"
    )
    a, b = sized.alias("a"), sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.count("*").cast("int").alias("n_shared"),
            F.first(F.col("a.sz")).cast("int").alias("n_a"),
            F.first(F.col("b.sz")).cast("int").alias("n_b"),
        )
        .where(F.col("n_shared") >= min_shared)
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(F.col("n_shared") / F.col("n_a"), 4).alias("share_a"),
            F.round(F.col("n_shared") / F.col("n_b"), 4).alias("share_b"),
        )
    )


def zipf_fit(
    df: DataFrame, top_k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Zipf-law fit of the corpus word-frequency distribution: the
    log-log linear-regression slope over the top ``top_k`` words —
    natural language sits near slope -1; a corpus that drifts far off
    is machine-generated, templated, or broken upstream (the classic
    corpus-health check).

    Determinism discipline: each ln() is rounded to 6 dp and quantized
    to DECIMAL (the repo's libm hygiene), the regression moments are
    EXACT decimal sums, and the closed-form slope/intercept are a fixed
    chain of double ops on identical exact inputs — bit-reproducible on
    any engine or partitioning. The frequency aggregate is the only
    data-sized shuffle; the fit runs on top_k rows.
    """
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w")
    )
    freqs = (
        words.groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(top_k)
    )
    ranked = freqs.select(
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("w")))
        .alias("rank"),
        "freq",
    )
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
    )


def heaps_curve(
    df: DataFrame,
    steps: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-word count at
    ``steps`` ingest-order prefixes of the corpus (doc_id order) — the
    vocabulary-saturation audit that tells you whether more data still
    buys new vocabulary. Prefix thresholds derive from max(doc_id)
    (one tiny aggregate); the word stream joins the 5-row threshold
    table broadcast-side and reduces with one distinct aggregate per
    prefix."""
    words = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    mx = df.agg(F.max(id_col).alias("mx"))
    thr = (
        mx.select(
            F.explode(
                F.array(*[F.lit(i) for i in range(1, steps + 1)])
            ).alias("step"),
            "mx",
        )
        .select(
            "step",
            F.expr("mx * step div " + str(steps)).alias("max_id"),
        )
    )
    joined = words.crossJoin(F.broadcast(thr)).where(
        F.col("__id") <= F.col("max_id")
    )
    return joined.groupBy("step").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("vocab"),
    )
