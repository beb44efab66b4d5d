"""Execution-match harness: the reference's evaluation protocol
(/root/reference/eval/evaluate.py:116-170) with our engine as the system
under test and live DuckDB as oracle.

Per case: run ``setup_sql`` on both engines → run ``query`` on both →
materialize each result as ``ddb_benchmark_result`` (every reference case's
validation_sql reads that view, dev.json:6) → run ``validation_sql`` on
both → compare canonicalized result sets (unordered multiset, float
formatting, NULL marker — matching Evaluator(etype='exec') semantics).
"""

from __future__ import annotations

import math
import re as _re
from dataclasses import dataclass, field
from typing import Optional

import duckdb


@dataclass
class Case:
    name: str
    db_id: str
    query: str
    setup_sql: Optional[str] = None
    validation_sql: str = "SELECT * FROM ddb_benchmark_result"
    categories: list[str] = field(default_factory=list)


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "asDict"):  # Spark Row (struct value) — IS a tuple subclass,
        # so this must be checked before the list/tuple branch
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in v.asDict().items()) + "}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: str(colnames[i]).lower())
    return sorted(
        tuple(_canon_cell(list(r)[i]) for i in order) for r in rows
    )


class OracleRunner:
    """Seeds one fixture database into both engines and runs cases."""

    def __init__(self, spark, statements: list[str]):
        from duckdb_nsql_spark import DuckSparkSession

        self.engine = DuckSparkSession(spark=spark)
        self.ddb = duckdb.connect()
        for stmt in statements:
            self.engine.execute(stmt)
            self.ddb.execute(stmt)

    def run_case(self, case: Case, tmp_dir: Optional[str] = None) -> None:
        """Raises AssertionError with a diff on mismatch."""
        cwd_token = "{tmp}"

        def fix(sql: Optional[str]) -> Optional[str]:
            if sql and tmp_dir and cwd_token in sql:
                return sql.replace(cwd_token, tmp_dir)
            return sql

        if case.setup_sql:
            self.engine.execute(fix(case.setup_sql))
            self.ddb.execute(fix(case.setup_sql))

        s_res = self.engine.execute(fix(case.query))
        d_rel = self.ddb.execute(fix(case.query))

        # materialize as ddb_benchmark_result on both sides
        if s_res is not None:
            s_res.createOrReplaceTempView("ddb_benchmark_result")
        q = fix(case.query)
        self.ddb.execute("DROP TABLE IF EXISTS ddb_benchmark_result")
        # PRAGMA fn('x') is CTAS-able only in table-function form
        q_ctas = _re.sub(
            r"^\s*PRAGMA\s+(\w+)", r"SELECT * FROM pragma_\1", q, flags=_re.IGNORECASE
        )
        for attempt in (q_ctas, f"SELECT * FROM ({q_ctas})"):
            try:
                self.ddb.execute(f"CREATE TABLE ddb_benchmark_result AS {attempt}")
                break
            except duckdb.Error:
                continue
        # statements that return no relation (DDL/SET): validation_sql
        # inspects side effects directly and the table stays absent

        s_val = self.engine.execute(fix(case.validation_sql))
        d_val = self.ddb.execute(fix(case.validation_sql))
        s_cols = s_val.columns
        s_rows = [tuple(r) for r in s_val.collect()]
        d_cols = [d[0] for d in d_val.description]
        d_rows = d_val.fetchall()

        assert len(s_rows) == len(d_rows), (
            f"{case.name}: row count {len(s_rows)} (engine) vs {len(d_rows)} (duckdb)"
        )
        sc = canon_rows(s_rows, s_cols)
        dc = canon_rows(d_rows, d_cols)
        if sc != dc:
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
            raise AssertionError(f"{case.name}: value mismatch; first diffs {diffs}")
