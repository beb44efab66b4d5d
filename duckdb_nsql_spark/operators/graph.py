"""Graph operators over candidate-pair graphs (linkage / near-dup
edges): deterministic PageRank.

Iterative algorithms are where naive Spark ports go wrong (unbounded
lineage, driver-side graph state, float drift across engines). This
module does them the scalable, replayable way:

- FIXED iteration count, loop unrolled into the plan (3 rounds over
  shallow dedup/linkage graphs; deeper graphs raise the constant) — no
  convergence collect at all;
- each round is ONE join (ranks x edges) + ONE dst-keyed aggregate,
  both keyed on the vertex id, so the partitioning is reused;
- ALL rank arithmetic is scaled-integer (rank x 10^12 as BIGINT,
  floor division for the degree split and the damping factor), which
  is bit-identical in Spark and DuckDB — the oracle replays the exact
  iteration with unrolled CTEs, no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_ITERS = 3


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = PR_ITERS,
) -> DataFrame:
    """PageRank (damping 0.85) over the undirected pair graph, ranks
    carried as ``round(rank * 10^12)`` BIGINTs:

    ``R_{t+1}(v) = (15*S) // (100*N) + (85 * sum_{u->v} R_t(u) // deg(u)) // 100``

    Floor division floor-biases each value by < 10^-12 — the price of
    an engine-exact iteration. Returns ``(doc_id, pr_scaled, pagerank)``
    with the double rendering derived by ONE division at the end.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionAll(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n_nodes = nodes.agg(F.count("*").alias("n"))
    # integral `div` throughout (Spark div == DuckDB // on positives) —
    # float floor(a/b) could round differently than exact int division
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "id",
        F.expr(f"cast({PR_SCALE} as bigint) div n").alias("r"),
        F.expr(f"cast({15 * PR_SCALE} as bigint) div (100 * n)").alias(
            "base"
        ),
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(F.col("id").alias("src"), "r", "base"), "src"
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("r div deg").alias("c"),
                "base",
            )
            .groupBy("id", "base")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            "id",
            (F.col("base") + F.expr("(85 * s) div 100")).cast("long").alias(
                "r"
            ),
            "base",
        )
    return ranks.select(
        F.col("id").alias("doc_id"),
        F.col("r").alias("pr_scaled"),
        F.round(F.col("r") / PR_SCALE, 8).alias("pagerank"),
    )
