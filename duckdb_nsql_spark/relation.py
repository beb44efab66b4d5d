"""DuckDBPyRelation-compatible lazy relation API over Spark DataFrames.

DuckDB's Python API splits in two: ``con.execute(sql)`` (cursor style,
the shape the reference harness uses — examples/utils.py:16-22) and
``con.sql(sql)`` / ``con.table(name)`` returning a **relation** with
chainable, lazily-composed operators (``project``, ``filter``,
``aggregate``, ``order``, ``join``, …) and terminal fetches (``df()``,
``fetchall()``, ``fetch_arrow_table()``, ``to_parquet()``).

This wrapper is that second API: every chainer builds SQL text over a
temp view of the current DataFrame and runs it through the session's
dialect pipeline, so DuckDB expression syntax (1-based slices, ``::``
casts, list comprehensions, macros) works inside ``filter``/``project``
exactly as it does in ``execute``. Composition stays fully lazy — each
step is a Catalyst plan transformation, no materialization until a
terminal is called, so a chained pipeline optimizes (pushdown, pruning,
join reordering) as one plan, which is the property that matters at
cluster scale.

Unknown attributes delegate to the underlying Spark DataFrame, so a
DuckRelation is also usable anywhere a DataFrame is expected
(``collect``, ``schema``, ``explain``, ``write``…).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


class DuckRelation:
    def __init__(self, session, df: DataFrame, alias: Optional[str] = None):
        self._session = session
        self._df = df
        self._alias = alias

    # ------------------------------------------------------------ internals

    def _view(self) -> str:
        return self._session._fresh_view(self._df)

    def _q(self, sql: str, keep_alias: bool = True) -> "DuckRelation":
        # Single-parent chainers (project/filter/order/limit/aggregate)
        # PRESERVE the relation alias, as duckdb does — so
        # rel.set_alias('lhs').filter(...).join(r, 'lhs.k = ...') binds.
        # Join/set-op results start fresh (keep_alias=False).
        return DuckRelation(
            self._session,
            self._session._query(sql),
            self._alias if keep_alias else None,
        )

    def _ref(self) -> str:
        v = self._view()
        return f"{v} AS {self._alias}" if self._alias else v

    # ------------------------------------------------------------- chainers

    def project(self, *exprs: str) -> "DuckRelation":
        proj = ", ".join(exprs) if exprs else "*"
        return self._q(f"SELECT {proj} FROM {self._ref()}")

    select = project

    def filter(self, condition: str) -> "DuckRelation":
        return self._q(f"SELECT * FROM {self._ref()} WHERE {condition}")

    where = filter

    def aggregate(
        self, aggr_expr: str, group_expr: str = ""
    ) -> "DuckRelation":
        if group_expr:
            return self._q(
                f"SELECT {aggr_expr} FROM {self._ref()} GROUP BY {group_expr}"
            )
        # DuckDB semantics: with no explicit groups, any non-aggregate
        # select item becomes an implicit grouping key (GROUP BY ALL)
        return self._q(
            f"SELECT {aggr_expr} FROM {self._ref()} GROUP BY ALL"
        )

    def order(self, order_expr: str) -> "DuckRelation":
        return self._q(f"SELECT * FROM {self._ref()} ORDER BY {order_expr}")

    sort = order

    def limit(self, n: int, offset: int = 0) -> "DuckRelation":
        if offset:
            return self._q(
                f"SELECT * FROM {self._ref()} LIMIT {int(n)} OFFSET {int(offset)}"
            )
        return DuckRelation(self._session, self._df.limit(int(n)), self._alias)

    def join(
        self, other: "DuckRelation", condition: str, how: str = "inner"
    ) -> "DuckRelation":
        how = {"outer": "FULL OUTER", "left": "LEFT", "right": "RIGHT",
               "inner": "", "semi": "SEMI", "anti": "ANTI",
               "cross": "CROSS"}.get(how.lower(), how.upper())
        right = other if isinstance(other, DuckRelation) else (
            DuckRelation(self._session, other)
        )
        if how == "CROSS":
            return self._q(
                f"SELECT * FROM {self._ref()} CROSS JOIN {right._ref()}",
                keep_alias=False,
            )
        return self._q(
            f"SELECT * FROM {self._ref()} {how} JOIN {right._ref()} "
            f"ON {condition}",
            keep_alias=False,
        )

    def distinct(self) -> "DuckRelation":
        return DuckRelation(self._session, self._df.distinct(), self._alias)

    def union(self, other: "DuckRelation") -> "DuckRelation":
        o = other._df if isinstance(other, DuckRelation) else other
        return DuckRelation(self._session, self._df.unionAll(o))

    def except_(self, other: "DuckRelation") -> "DuckRelation":
        o = other._df if isinstance(other, DuckRelation) else other
        return DuckRelation(self._session, self._df.exceptAll(o))

    def intersect(self, other: "DuckRelation") -> "DuckRelation":
        o = other._df if isinstance(other, DuckRelation) else other
        return DuckRelation(self._session, self._df.intersectAll(o))

    def set_alias(self, alias: str) -> "DuckRelation":
        return DuckRelation(self._session, self._df, alias)

    alias = set_alias

    def count(self, column: Optional[str] = None):
        """duckdb ``rel.count("col")`` returns a 1-row relation; with no
        argument this keeps Spark's ``df.count() -> int`` so the relation
        stays drop-in usable as a DataFrame."""
        if column is None:
            return self._df.count()
        return self._q(
            f'SELECT count({column}) AS "count({column})" FROM {self._ref()}'
        )

    def sum(self, column: str) -> "DuckRelation":
        return self._q(
            f'SELECT sum({column}) AS "sum({column})" FROM {self._ref()}'
        )

    def min(self, column: str) -> "DuckRelation":
        return self._q(
            f'SELECT min({column}) AS "min({column})" FROM {self._ref()}'
        )

    def max(self, column: str) -> "DuckRelation":
        return self._q(
            f'SELECT max({column}) AS "max({column})" FROM {self._ref()}'
        )

    def mean(self, column: str) -> "DuckRelation":
        return self._q(
            f'SELECT avg({column}) AS "avg({column})" FROM {self._ref()}'
        )

    avg = mean

    def describe(self) -> "DuckRelation":
        view = self._view()
        return DuckRelation(
            self._session, self._session.execute(f"SUMMARIZE {view}")
        )

    # ------------------------------------------------------------ terminals

    def df(self):
        return self._df.toPandas()

    fetchdf = df
    to_df = df

    def fetchall(self) -> list[tuple]:
        return [tuple(r) for r in self._df.collect()]

    def fetchone(self) -> Optional[tuple]:
        rows = self._df.limit(1).collect()
        return tuple(rows[0]) if rows else None

    def fetchmany(self, size: int = 1) -> list[tuple]:
        return [tuple(r) for r in self._df.limit(int(size)).collect()]

    def fetch_arrow_table(self):
        import pyarrow as pa

        return pa.Table.from_pandas(self._df.toPandas())

    arrow = fetch_arrow_table
    to_arrow_table = fetch_arrow_table

    def fetchnumpy(self) -> dict:
        pdf = self._df.toPandas()
        return {c: pdf[c].to_numpy() for c in pdf.columns}

    def show(self, max_rows: int = 20) -> None:
        self._df.show(max_rows, truncate=False)

    def explain(self, type: str = "standard"):  # noqa: A002 — duckdb name
        return self._df.explain(
            "formatted" if type in ("standard", "formatted") else type
        )

    # ------------------------------------------------------- materializers

    def create(self, table_name: str) -> None:
        """CREATE TABLE <name> AS this relation (duckdb rel.create)."""
        self._session._register_managed(table_name, self._df)

    def create_view(self, view_name: str, replace: bool = True) -> None:
        self._session.register(view_name, self._df)

    to_view = create_view

    def insert_into(self, table_name: str) -> None:
        target = self._session.table(table_name)
        key = self._session._resolve_table_key(table_name)
        aligned = self._session._align_insert(
            self._df, target, list(self._df.columns)
        )
        self._session._register_managed(key, target.unionByName(aligned))

    def to_parquet(self, file_name: str, **kw) -> None:
        from . import io_utils

        io_utils.write_copy_to(self._df, file_name, fmt="parquet")

    write_parquet = to_parquet

    def to_csv(self, file_name: str, *, header: bool = True, sep: str = ",",
               **kw) -> None:
        from . import io_utils

        io_utils.write_copy_to(
            self._df, file_name, fmt="csv", header=header, delimiter=sep
        )

    write_csv = to_csv

    # ------------------------------------------------------------ metadata

    @property
    def columns(self) -> list[str]:
        return list(self._df.columns)

    @property
    def types(self) -> list[str]:
        from .types import spark_type_to_duckdb

        return [spark_type_to_duckdb(f.dataType) for f in self._df.schema.fields]

    dtypes = types

    @property
    def shape(self) -> tuple[int, int]:
        return (self._df.count(), len(self._df.columns))

    def __len__(self) -> int:
        return self._df.count()

    def __repr__(self) -> str:
        cols = ", ".join(
            f"{c} {t}" for c, t in zip(self.columns, self.types)
        )
        return f"DuckRelation({cols})"

    # ------------------------------------------------ DataFrame delegation

    def __getattr__(self, name: str):
        # anything not part of the duckdb relation surface falls through to
        # the Spark DataFrame, so the relation is usable as a DataFrame too
        return getattr(self._df, name)
