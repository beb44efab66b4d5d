"""Run the reference's own 75-case benchmark end-to-end.

This executes /root/reference/eval/data/dev.json with the *reference's
protocol* (eval/evaluate.py:116-170 + the duckdb branch of
test-suite-sql-eval): per case, load the case's database, run
``setup_sql``, run ``query``, materialize a relation result as
``ddb_benchmark_result``, run ``validation_sql``, and compare the
validation result sets — here between OUR engine (system under test)
and DuckDB (oracle), where the reference compares gold vs predicted SQL
on DuckDB alone.

Database state comes from the reference's .duckdb files
(eval/data/databases/<db>/<db>.duckdb), dumped once to parquet so both
engines ingest identical bytes. Each case gets a fresh working
directory and fresh table registrations (cases mutate state: INSERT /
UPDATE / ALTER / COPY FROM).

Comparison is positional (the reference's evaluator compares result
tuples, not column names) over an order-insensitive multiset, floats at
6 significant digits, unless the case is inherently loose:

- ``sample``  — nondeterministic row membership; compare row count ratio
- ``summarize`` / ``describe-stats`` — approx stats differ by algorithm;
  compare shape + column_name/column_type cells
- ``explain`` — plan text is engine-specific; both must be non-empty
- ``version`` — engine version strings differ; both must return 1 row
- ``setting`` — value text compared case/underscore-insensitively
  (DuckDB renders 'nulls_last', the dialect accepts 'NULLS LAST')

HTTP-source cases (24, 25, 26) run against an in-process loopback
http.server serving a deterministic titanic-shaped fixture: the engine
reads it over real HTTP (io_utils.stage_if_remote — the same code path a
remote URL takes), while the DuckDB oracle reads the same bytes from
disk (httpfs cannot install offline). Both sides see identical content,
so the comparison stays meaningful.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
from dataclasses import dataclass, field
from typing import Optional

DEV_JSON = "/root/reference/eval/data/dev.json"
DB_DIR = "/root/reference/eval/data/databases"

TITANIC_URL = (
    "https://raw.githubusercontent.com/datasciencedojo/datasets/"
    "master/titanic.csv"
)
_HTTP: dict = {"port": None, "path": None}


def _loopback_titanic() -> tuple[str, str]:
    """(url, local_path) of the titanic fixture on a loopback server."""
    if _HTTP["port"] is None:
        import http.server
        import tempfile
        import threading

        d = tempfile.mkdtemp(prefix="devjson_http_")
        rows = ["PassengerId,Survived,Pclass,Name,Sex,Age,SibSp,Parch,"
                "Ticket,Fare,Cabin,Embarked"]
        for i in range(1, 101):
            age = "" if i % 10 == 0 else f"{18 + i % 40}.5"
            cabin = "" if i % 4 else f"C{i}"
            rows.append(
                f"{i},{i % 2},{1 + i % 3},Passenger {i},"
                f"{'male' if i % 2 else 'female'},{age},{i % 3},{i % 2},"
                f"T{1000 + i},{round(7.25 + i * 1.37, 2)},{cabin},"
                f"{'SCQ'[i % 3]}"
            )
        path = os.path.join(d, "titanic.csv")
        with open(path, "w") as fh:
            fh.write("\n".join(rows) + "\n")
        handler = lambda *a, **kw: __import__(  # noqa: E731
            "http.server", fromlist=["SimpleHTTPRequestHandler"]
        ).SimpleHTTPRequestHandler(*a, directory=d, **kw)
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        _HTTP["port"] = srv.server_address[1]
        _HTTP["path"] = path
    return f"http://127.0.0.1:{_HTTP['port']}/titanic.csv", _HTTP["path"]

# case index -> loose-comparison kind (see module docstring)
LOOSE = {
    0: "tie_topk",  # ORDER BY count DESC LIMIT 10 truncates inside a tie group
    21: "sample",
    23: "summarize",
    30: "version",
    51: "explain",
    27: "setting",
    68: "summarize",
    70: "setting",
    71: "setting",
}


def load_cases() -> list[dict]:
    with open(DEV_JSON) as fh:
        return json.load(fh)


_DUMPED: dict[str, list[str]] = {}


def dump_db(db_id: str, cache_root: str) -> list[str]:
    """Dump every table of a reference .duckdb file to parquet (once)."""
    if db_id in _DUMPED:
        return _DUMPED[db_id]
    import duckdb

    out_dir = os.path.join(cache_root, db_id)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(DB_DIR, db_id, f"{db_id}.duckdb")
    tables: list[str] = []
    if os.path.exists(path):
        con = duckdb.connect(path, read_only=True)
        try:
            for (t,) in con.execute("SHOW TABLES").fetchall():
                con.execute(
                    f'COPY (SELECT * FROM "{t}") TO '
                    f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
                )
                tables.append(t)
        finally:
            con.close()
    _DUMPED[db_id] = tables
    return tables


@dataclass
class CaseResult:
    idx: int
    db_id: str
    category: str
    status: str  # ok | mismatch | error | skip
    detail: str = ""
    engine_rows: Optional[int] = None
    oracle_rows: Optional[int] = None
    loose: str = ""


def _canon_cell(v, setting_mode: bool = False) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row (struct value) — IS a tuple too
        d = v.asDict()
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in d.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in v.items()) + "}"
    s = str(v)
    if setting_mode:
        s = s.lower().replace("_", " ")
    return s


def canon_rows(rows, setting_mode: bool = False) -> list[tuple]:
    out = []
    for r in rows:
        out.append(tuple(_canon_cell(v, setting_mode) for v in r))
    return sorted(out)


def _is_relation(df) -> bool:
    return df is not None and len(df.columns) > 0


class OracleDB:
    """DuckDB side of one case, run inside its own working directory."""

    def __init__(self, workdir: str, parquet_dir: str, tables: list[str],
                 db_id: str = ""):
        import duckdb

        self.workdir = workdir
        self.con = duckdb.connect()
        if db_id and db_id.isidentifier():
            # name the primary catalog like connect('<db>.duckdb') would,
            # so `nyc.taxi` (dev.json:276) resolves on the oracle too
            self.con.execute(f"ATTACH ':memory:' AS {db_id}; USE {db_id}")
        for t in tables:
            self.con.execute(
                f'CREATE TABLE "{t}" AS SELECT * FROM '
                f"read_parquet('{parquet_dir}/{t}.parquet')"
            )

    _last_rel = None

    def run(self, sql: str):
        """Execute (possibly multi-statement) SQL; return rows of the last
        relation-producing statement, or None."""
        cwd = os.getcwd()
        os.chdir(self.workdir)
        try:
            rel = self.con.sql(sql)
            if rel is None:
                self._last_rel = None
                return None, []
            self._last_rel = rel.fetch_arrow_table()
            return (
                [tuple(r.values()) for r in self._last_rel.to_pylist()],
                self._last_rel.column_names,
            )
        finally:
            os.chdir(cwd)

    def materialize_result(self) -> None:
        if self._last_rel is not None:
            self.con.register("ddb_benchmark_result", self._last_rel)

    def close(self) -> None:
        self.con.close()


class EngineDB:
    """Our engine's side of one case, in its own working directory."""

    def __init__(self, spark, workdir: str, parquet_dir: str, tables: list[str],
                 db_id: str = ""):
        from duckdb_nsql_spark import io_utils
        from duckdb_nsql_spark.session import DuckSparkSession

        self.workdir = workdir
        self.eng = DuckSparkSession(spark=spark)
        if db_id and db_id.isidentifier():
            self.eng.name_primary_database(db_id)
        for t in tables:
            self.eng.register(
                t,
                io_utils.read_parquet_table(
                    spark, os.path.join(parquet_dir, f"{t}.parquet")
                ),
            )
        self._last_df = None

    def run(self, sql: str):
        cwd = os.getcwd()
        os.chdir(self.workdir)
        try:
            df = self.eng.execute(sql)
            if not _is_relation(df):
                self._last_df = None
                return None, []
            self._last_df = df
            rows = [tuple(r) for r in df.collect()]
            return rows, list(df.columns)
        finally:
            os.chdir(cwd)

    def materialize_result(self) -> None:
        if self._last_df is not None:
            self.eng.register("ddb_benchmark_result", self._last_df)


def run_case(spark, idx: int, case: dict, workroot: str, cache_root: str) -> CaseResult:
    db_id = case["db_id"]
    cat = case.get("category", "")
    loose = LOOSE.get(idx, "")
    tables = dump_db(db_id, cache_root)
    parquet_dir = os.path.join(cache_root, db_id)

    eng_dir = os.path.join(workroot, f"case{idx:02d}_engine")
    ora_dir = os.path.join(workroot, f"case{idx:02d}_oracle")
    for d in (eng_dir, ora_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    # case 74 ATTACHes 'who.ddb' from the working directory
    if "who.ddb" in case["query"]:
        src = os.path.join(DB_DIR, "who", "who.duckdb")
        for d in (eng_dir, ora_dir):
            shutil.copy(src, os.path.join(d, "who.ddb"))

    oracle = OracleDB(ora_dir, parquet_dir, tables, db_id)
    engine = EngineDB(spark, eng_dir, parquet_dir, tables, db_id)
    try:
        setup = (case.get("setup_sql") or "").strip()
        if setup and setup != ";":
            oracle.run(setup)
            engine.run(setup)
        q = case["query"]
        eq = q
        if TITANIC_URL in q:
            # engine fetches over loopback HTTP (real staging path);
            # oracle reads the identical bytes from disk (no httpfs offline)
            url, local = _loopback_titanic()
            eq = q.replace(TITANIC_URL, url)
            q = q.replace(TITANIC_URL, local)
        o_rows, o_cols = oracle.run(q)
        e_rows, e_cols = engine.run(eq)
        oracle.materialize_result()
        engine.materialize_result()
        v = (case.get("validation_sql") or "").strip()
        vo_rows, vo_cols = oracle.run(v) if v else (o_rows, o_cols)
        ve_rows, ve_cols = engine.run(v) if v else (e_rows, e_cols)
        vo_rows = vo_rows or []
        ve_rows = ve_rows or []
        return _compare(
            idx, db_id, cat, loose, ve_rows, ve_cols, vo_rows, vo_cols
        )
    except Exception as exc:  # noqa: BLE001
        return CaseResult(
            idx, db_id, cat, "error", f"{type(exc).__name__}: {exc}"[:300]
        )
    finally:
        oracle.close()


def _compare(idx, db_id, cat, loose, e_rows, e_cols, o_rows, o_cols) -> CaseResult:
    ne, no = len(e_rows), len(o_rows)
    res = CaseResult(idx, db_id, cat, "ok", engine_rows=ne, oracle_rows=no,
                     loose=loose)
    if loose == "explain" or loose == "version":
        if ne < 1 or no < 1:
            res.status, res.detail = "mismatch", "empty result"
        return res
    if loose == "sample":
        # nondeterministic row membership on BOTH engines (DuckDB system
        # sampling is vector-granular and can return 0 rows at 1% of a
        # small table); sanity-check the magnitude only
        if ne > max(no * 10, 200):
            res.status, res.detail = "mismatch", f"sample rows {ne} vs {no}"
        return res
    if loose == "tie_topk":
        # LIMIT k truncates inside a tie group of the sort key: membership
        # of the tied tail is unspecified. The sort-key multiset is pinned.
        ke = sorted(r[0] for r in e_rows)
        ko = sorted(r[0] for r in o_rows)
        if ke != ko:
            res.status, res.detail = "mismatch", f"sort keys {ke} != {ko}"
        return res
    if loose == "summarize":
        if ne != no:
            res.status, res.detail = "mismatch", f"rows {ne} != {no}"
            return res
        # column_name/column_type cells (first two positions) must agree
        e_head = sorted((r[0], str(r[1])) for r in e_rows)
        o_head = sorted((r[0], str(r[1])) for r in o_rows)
        if e_head != o_head:
            diff = [p for p in zip(e_head, o_head) if p[0] != p[1]][:3]
            res.status, res.detail = "mismatch", f"summarize head: {diff}"
        return res
    setting = loose == "setting"
    ce = canon_rows(e_rows, setting)
    co = canon_rows(o_rows, setting)
    if ce != co:
        first = next(
            (f"{a} != {b}" for a, b in zip(ce, co) if a != b),
            f"rows {ne} != {no}",
        )
        res.status, res.detail = "mismatch", first[:300]
    return res


def run_all(spark, workroot: str, indices: Optional[list[int]] = None) -> list[CaseResult]:
    cases = load_cases()
    cache_root = os.path.join(workroot, "_dbcache")
    os.makedirs(cache_root, exist_ok=True)
    out = []
    for i, c in enumerate(cases):
        if indices is not None and i not in indices:
            continue
        out.append(run_case(spark, i, c, workroot, cache_root))
    return out


def main() -> None:
    import tempfile

    from duckdb_nsql_spark.session import build_spark

    spark = build_spark(app_name="devjson-parity", cpus=min(16, os.cpu_count() or 8))
    workroot = tempfile.mkdtemp(prefix="devjson_")
    results = run_all(spark, workroot)
    ok = sum(1 for r in results if r.status == "ok")
    ran = sum(1 for r in results if r.status != "skip")
    lines = [
        "# DEVJSON_PARITY — reference benchmark, end-to-end",
        "",
        "Protocol: eval/evaluate.py:116-170 (setup_sql -> query -> "
        "ddb_benchmark_result -> validation_sql), engine vs DuckDB oracle "
        "per case. See harness/devjson.py.",
        "",
        f"**{ok}/{ran} executed cases match** (HTTP-source cases run "
        "against a loopback fixture server; see module docstring).",
        "",
        "| # | db | category | status | loose | detail |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r.idx} | {r.db_id} | {r.category} | {r.status} | "
            f"{r.loose or ''} | {r.detail or ''} |"
        )
    with open("DEVJSON_PARITY.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"devjson parity: {ok}/{ran} ok -> DEVJSON_PARITY.md")
    for r in results:
        if r.status not in ("ok", "skip"):
            print(f"  [{r.idx:2d}] {r.db_id:13s} {r.status}: {r.detail}")


if __name__ == "__main__":
    main()
