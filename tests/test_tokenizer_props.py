"""Property tests: the tokenizer round-trips losslessly and the rewrite
pipeline is a no-op on plain ANSI SQL (so Catalyst always sees exactly
what the user wrote unless a DuckDB-ism is present)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_nsql_spark.frontend.rewrites import rewrite_sql
from duckdb_nsql_spark.frontend.tokenizer import render, tokenize

sql_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
        whitelist_characters="_()*,.<>=+-/'\";:%|![]{}\n\t",
    ),
    max_size=200,
)


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_tokenize_roundtrip(s):
    assert render(tokenize(s)) == s


PLAIN_QUERIES = [
    "SELECT a, b FROM t WHERE x > 1 AND y IN (SELECT z FROM u) ORDER BY a",
    "WITH c AS (SELECT 1 AS x) SELECT sum(x) AS s FROM c GROUP BY x HAVING s > 0",
    "SELECT CASE WHEN a THEN 'x' ELSE 'y' END, count(*) FROM t GROUP BY 1",
    "SELECT t.a, u.b FROM t JOIN u ON t.id = u.id LEFT JOIN v ON v.id = t.id",
    "SELECT row_number() OVER (PARTITION BY a ORDER BY b DESC) AS rn FROM t",
    "SELECT * FROM t UNION ALL SELECT * FROM u EXCEPT SELECT * FROM v",
    "INSERT INTO t VALUES (1, 'a'), (2, 'b')",
]


def norm(s):
    return re.sub(r"\s+", " ", s).strip()


def test_plain_sql_passthrough():
    for q in PLAIN_QUERIES:
        out = rewrite_sql(q)
        # ORDER BY items may gain NULLS markers via the session layer only;
        # the core rewrite pipeline itself must not touch plain SQL
        assert norm(out) == norm(q), q
