"""Durable managed tables: a minimal copy-on-write table format.

``connect(database='/path/dir')`` mirrors ``duckdb.connect('file.duckdb')``
(reference harness usage: eval/evaluate.py opens a database file per
case): managed tables survive the session. The layout is the same shape
production table formats use, scaled down:

- every write is a NEW immutable parquet directory ``<root>/<table>/v{N}``
  (copy-on-write — readers of the previous version are never disturbed,
  and a crashed write leaves no visible change);
- commit is an atomic metadata-pointer swap: ``_catalog.json`` is written
  to a temp file and ``os.replace``d, so the catalog always names a fully
  written version;
- constraint metadata Spark types can't carry (ENUM members, declared
  type renderings, fixed-array lengths) rides in the catalog entry.

That is precisely Delta/Iceberg's commit model (immutable data files +
atomic metadata swap) without transactions or time travel; on a real
cluster swap this module for Delta/Iceberg behind the same three calls
(load / save_table / drop_table) — docs/PLANS.md tracks that as the
cluster path. The in-session catalog (no ``database=``) stays the
default, matching ``duckdb.connect()``'s in-memory mode.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_CATALOG = "_catalog.json"
_KEEP_VERSIONS = 2  # current + previous (older readers may still scan it)


class DurableWarehouse:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------- catalog
    def _read_catalog(self) -> dict:
        p = os.path.join(self.root, _CATALOG)
        if not os.path.exists(p):
            return {"tables": {}}
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)

    def _write_catalog(self, cat: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".catalog.tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(cat, f, indent=1, sort_keys=True)
            os.replace(tmp, os.path.join(self.root, _CATALOG))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _table_dir(self, name: str) -> str:
        safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
        return f"{safe}-{hashlib.md5(name.encode()).hexdigest()[:6]}"

    # -------------------------------------------------------------- tables
    def tables(self) -> dict[str, dict]:
        return self._read_catalog()["tables"]

    def load_df(self, spark: SparkSession, name: str) -> DataFrame:
        ent = self.tables()[name]
        return spark.read.parquet(
            os.path.join(self.root, ent["dir"], ent["version"])
        )

    def save_table(
        self, spark: SparkSession, name: str, df: DataFrame, meta: dict
    ) -> DataFrame:
        """Copy-on-write commit: write a new version dir, swap the catalog
        pointer, GC versions older than the previous one. Returns the
        re-read DataFrame (lineage truncated to a plain parquet scan)."""
        cat = self._read_catalog()
        ent = cat["tables"].get(name)
        tdir = ent["dir"] if ent else self._table_dir(name)
        prev_n = int(ent["version"][1:]) if ent else -1
        version = f"v{prev_n + 1:06d}"
        out = os.path.join(self.root, tdir, version)
        df.write.mode("overwrite").parquet(out)
        cat["tables"][name] = {"dir": tdir, "version": version, "meta": meta}
        self._write_catalog(cat)
        base = os.path.join(self.root, tdir)
        for v in os.listdir(base):
            if v.startswith("v") and int(v[1:]) < prev_n + 1 - (_KEEP_VERSIONS - 1):
                shutil.rmtree(os.path.join(base, v), ignore_errors=True)
        return spark.read.parquet(out)

    def drop_table(self, name: str) -> None:
        cat = self._read_catalog()
        ent = cat["tables"].pop(name, None)
        self._write_catalog(cat)
        if ent:
            shutil.rmtree(os.path.join(self.root, ent["dir"]), ignore_errors=True)
