"""Durable managed tables: a minimal multi-writer copy-on-write format.

``connect(database='/path/dir')`` mirrors ``duckdb.connect('file.duckdb')``
(reference harness usage: eval/evaluate.py opens a database file per
case): managed tables survive the session. The layout is the same shape
production table formats (Delta/Iceberg) use, scaled down:

- every write is a NEW immutable parquet directory
  ``<root>/<table>/v{N}-{token}`` (copy-on-write — readers of the
  previous version are never disturbed, and a crashed write leaves no
  visible change, only an unreferenced directory the GC reaps);
- commit is an APPEND to a numbered commit log ``_commits/{N}.json``
  created with O_EXCL — on a POSIX filesystem exactly one writer wins
  each commit number, which is precisely Delta Lake's optimistic-
  concurrency protocol. Losers re-read the log and either REBASE (their
  table wasn't touched by the winning commit) or raise
  :class:`CommitConflict` (write-write conflict on the same table,
  DuckDB's "Transaction conflict" analogue);
- each commit file carries the full (tiny) table catalog, so readers
  resolve current state from the single highest-numbered commit — no
  log replay; ``_catalog.json`` is additionally maintained as a
  best-effort checkpoint for legacy single-pointer warehouses;
- constraint metadata Spark types can't carry (ENUM members, declared
  type renderings, fixed-array lengths) rides in the catalog entry.

GC is retention-based like Delta VACUUM: a data directory is removed
only when it is (a) not referenced by any of the last few commits and
(b) older than ``gc_grace_s`` — so a concurrent writer's staged-but-
uncommitted directory is never deleted from under it.

On a real cluster swap this module for Delta/Iceberg behind the same
three calls (load / save_table / drop_table) — docs/PLANS.md tracks
that as the cluster path. The in-session catalog (no ``database=``)
stays the default, matching ``duckdb.connect()``'s in-memory mode.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_CATALOG = "_catalog.json"
_COMMITS = "_commits"
_KEEP_COMMITS = 8  # GC looks this far back for referenced versions


class CommitConflict(RuntimeError):
    """Two writers modified the same table concurrently (write-write
    conflict). Mirrors DuckDB's transaction-conflict error and Delta's
    ConcurrentModificationException: the loser must re-read and retry
    its whole operation."""


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake runtime is on the session's JVM classpath
    (delta-spark jars + SQL extension). This container ships no Delta
    jars and has no network, so this returns False here; on a cluster
    with Delta installed the same warehouse transparently stores managed
    tables as Delta tables (``table_format='delta'``)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:
        return False


class DurableWarehouse:
    """``fmt``: storage format for managed table data.

    - ``'parquet'`` (default): the homegrown copy-on-write version dirs +
      O_EXCL commit log documented above — zero dependencies.
    - ``'delta'``: each table is a Delta Lake table directory;
      Delta's own transaction log handles data versioning/concurrency
      (time travel, VACUUM), while this warehouse's commit log keeps
      carrying the name->dir catalog and the type metadata Spark can't
      (ENUM members, declared renderings). Requires the delta-spark jars
      on the JVM classpath — validated lazily at first load/save with a
      clear error, since format choice is per-warehouse-dir and a
      catalog-only operation (DROP/att views) needs no jars.

    Resolution order: explicit ``fmt`` arg > ``SPARK_GRAFT_TABLE_FORMAT``
    env > the format recorded by the warehouse's first commit > parquet.
    A warehouse never mixes formats: the first table commit records the
    format and later sessions inherit it.
    """

    def __init__(
        self, root: str, gc_grace_s: float = 300.0, fmt: str | None = None
    ):
        self.root = os.path.abspath(root)
        self.gc_grace_s = gc_grace_s
        os.makedirs(os.path.join(self.root, _COMMITS), exist_ok=True)
        recorded = self._latest_commit()[1].get("format")
        self.fmt = (
            fmt
            or os.environ.get("SPARK_GRAFT_TABLE_FORMAT")
            or recorded
            or "parquet"
        )
        if self.fmt not in ("parquet", "delta"):
            raise ValueError(
                f"unsupported table format {self.fmt!r}"
                " (expected 'parquet' or 'delta')"
            )
        if recorded and self.fmt != recorded:
            raise ValueError(
                f"warehouse {self.root} was created with format"
                f" {recorded!r}; cannot reopen as {self.fmt!r}"
            )

    def _require_delta(self, spark: SparkSession) -> None:
        if not delta_available(spark):
            raise RuntimeError(
                "table_format='delta' requires the Delta Lake runtime"
                " (delta-spark jars + io.delta.sql.DeltaSparkSessionExtension)"
                " on the Spark classpath; none found. Use the default"
                " 'parquet' format, or install delta-spark on the cluster."
            )

    @staticmethod
    def _delta_log_version(spark: SparkSession, path: str) -> int | None:
        """Current Delta-log version of the table at ``path`` (None when
        the log is unreadable). Recorded into every delta commit entry so
        ``load_df_at`` can time-travel with ``versionAsOf`` — without it a
        historical read would silently return the CURRENT snapshot."""
        from delta.tables import DeltaTable  # delta-spark runtime

        try:
            hist = DeltaTable.forPath(spark, path).history(1).collect()
        except Exception:  # noqa: BLE001 — log not yet written
            return None
        return hist[0]["version"] if hist else None

    # --------------------------------------------------------- commit log
    def _latest_commit(self) -> tuple[int, dict]:
        """(commit number, catalog) from the highest numbered commit;
        falls back to the legacy single-pointer ``_catalog.json`` (or an
        empty catalog) when the log is empty."""
        cdir = os.path.join(self.root, _COMMITS)
        best, path = -1, None
        try:
            for f in os.listdir(cdir):
                if f.endswith(".json"):
                    try:
                        n = int(f[:-5])
                    except ValueError:
                        continue
                    if n > best:
                        best, path = n, os.path.join(cdir, f)
        except FileNotFoundError:
            pass
        if path is None:
            legacy = os.path.join(self.root, _CATALOG)
            if os.path.exists(legacy):
                with open(legacy, "r", encoding="utf-8") as f:
                    return -1, json.load(f)
            return -1, {"tables": {}}
        with open(path, "r", encoding="utf-8") as f:
            return best, json.load(f)

    def _try_commit(self, number: int, cat: dict) -> bool:
        """Atomically claim commit ``number``. O_EXCL file creation means
        exactly one writer can own each number; False = lost the race."""
        cdir = os.path.join(self.root, _COMMITS)
        os.makedirs(cdir, exist_ok=True)
        path = os.path.join(cdir, f"{number:020d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(cat, f, indent=1, sort_keys=True)
        except BaseException:
            os.unlink(path)
            raise
        self._write_checkpoint(cat)
        return True

    def _write_checkpoint(self, cat: dict) -> None:
        """Best-effort ``_catalog.json`` checkpoint (legacy readers)."""
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".catalog.tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(cat, f, indent=1, sort_keys=True)
            os.replace(tmp, os.path.join(self.root, _CATALOG))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _commit_entry(self, name: str, entry: dict | None, base) -> None:
        """CAS loop: re-read latest catalog, verify OUR table is untouched
        since ``base`` (else CommitConflict), apply, try to claim the next
        commit number. Another writer committing a DIFFERENT table just
        makes us rebase and retry."""
        while True:
            ver, cat = self._latest_commit()
            if cat["tables"].get(name) != base:
                raise CommitConflict(
                    f"write-write conflict on table {name!r}: another "
                    "writer committed it concurrently"
                )
            if entry is None:
                cat["tables"].pop(name, None)
            else:
                cat["tables"][name] = entry
            cat["format"] = self.fmt  # first table commit pins the format
            if self._try_commit(ver + 1, cat):
                return

    # -------------------------------------------- legacy catalog interface
    def _read_catalog(self) -> dict:
        return self._latest_commit()[1]

    def _write_catalog(self, cat: dict) -> None:
        """Full-catalog restore (transaction ROLLBACK path): commits the
        given catalog wholesale at the next commit number."""
        while True:
            ver, _ = self._latest_commit()
            if self._try_commit(ver + 1, cat):
                return

    def _table_dir(self, name: str) -> str:
        safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
        return f"{safe}-{hashlib.md5(name.encode()).hexdigest()[:6]}"

    # -------------------------------------------------------------- tables
    def tables(self) -> dict[str, dict]:
        return self._read_catalog()["tables"]

    def load_df(self, spark: SparkSession, name: str) -> DataFrame:
        ent = self.tables()[name]
        if self.fmt == "delta":
            self._require_delta(spark)
            return spark.read.format("delta").load(
                os.path.join(self.root, ent["dir"])
            )
        v = ent["version"]
        segments = v if isinstance(v, list) else [v]
        return spark.read.parquet(
            *[os.path.join(self.root, ent["dir"], s) for s in segments]
        )

    def save_table(
        self, spark: SparkSession, name: str, df: DataFrame, meta: dict
    ) -> DataFrame:
        """Copy-on-write commit: write a new uniquely-named version dir,
        then CAS-append to the commit log; GC unreferenced old versions.
        Returns the re-read DataFrame (lineage truncated to a plain
        parquet scan)."""
        ver, cat = self._latest_commit()
        base = cat["tables"].get(name)
        tdir = base["dir"] if base else self._table_dir(name)
        if self.fmt == "delta":
            # Delta's own transaction log provides versioning, atomic
            # overwrite, and concurrency — no homegrown version dirs or
            # GC; our commit log only tracks the catalog entry + meta.
            self._require_delta(spark)
            out = os.path.join(self.root, tdir)
            df.write.format("delta").mode("overwrite").option(
                "overwriteSchema", "true"
            ).save(out)
            self._commit_entry(
                name,
                {
                    "dir": tdir,
                    "version": "delta",
                    "delta_version": self._delta_log_version(spark, out),
                    "meta": meta,
                },
                base,
            )
            return spark.read.format("delta").load(out)
        vname = f"v{ver + 1:06d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, tdir, vname)
        df.write.mode("overwrite").parquet(out)
        try:
            self._commit_entry(
                name, {"dir": tdir, "version": vname, "meta": meta}, base
            )
        except CommitConflict:
            shutil.rmtree(out, ignore_errors=True)  # our staged data
            raise
        self._gc(name, tdir)
        return spark.read.parquet(out)

    def append_table(
        self,
        spark: SparkSession,
        name: str,
        df: DataFrame,
        meta: dict | None = None,
        txn: "tuple[str, int] | None" = None,
    ) -> None:
        """Commit an APPEND as a new immutable segment dir plus a CAS
        catalog entry whose version is the segment LIST — existing files
        are never rewritten, so continuous ingest costs O(batch), not
        O(table) (the scale path; in delta mode Delta's own log appends
        natively). A full ``save_table`` rewrite later collapses the
        segments back to one version dir and GC reclaims them.

        ``meta`` replaces the table's meta when given (the streaming
        sink threads its batch watermark through here so data + progress
        commit atomically in ONE commit-log entry); None keeps the
        existing meta.

        ``txn``: an ``(appId, version)`` idempotence key. On the parquet
        path the CAS commit already makes data+watermark atomic, so it
        is unused. On the DELTA path the data append and the catalog
        commit are SEPARATE transactions — without a key, a crash (or
        CommitConflict) between them would leave appended rows whose
        batch replays as a duplicate. The key becomes Delta's
        ``txnAppId``/``txnVersion`` writer options, which make the
        replayed append a no-op inside Delta's own log; the streaming
        sink passes ``(stream_id, batch_id)``."""
        ver, cat = self._latest_commit()
        base = cat["tables"].get(name)
        tdir = base["dir"] if base else self._table_dir(name)
        if meta is None:
            meta = (base or {}).get("meta") or {}
        if self.fmt == "delta":
            self._require_delta(spark)
            out = os.path.join(self.root, tdir)
            w = df.write.format("delta").mode("append")
            if txn is not None:
                w = w.option("txnAppId", txn[0]).option(
                    "txnVersion", str(txn[1])
                )
            w.save(out)
            self._commit_entry(
                name,
                {
                    "dir": tdir,
                    "version": "delta",
                    "delta_version": self._delta_log_version(spark, out),
                    "meta": meta,
                },
                base,
            )
            return
        segments: list[str] = []
        if base is not None:
            v = base["version"]
            segments = list(v) if isinstance(v, list) else [v]
        seg = f"v{ver + 1:06d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, tdir, seg)
        df.write.mode("overwrite").parquet(out)
        try:
            self._commit_entry(
                name,
                {"dir": tdir, "version": segments + [seg], "meta": meta},
                base,
            )
        except CommitConflict:
            shutil.rmtree(out, ignore_errors=True)  # our staged segment
            raise

    def upsert_table(
        self,
        spark: SparkSession,
        name: str,
        batch_df: DataFrame,
        key_cols: list[str],
        order_col: str,
        tiebreak_cols: "list[str] | None" = None,
        meta: dict | None = None,
        txn: "tuple[str, int] | None" = None,
    ) -> None:
        """CDC upsert: per key keep the row with the greatest
        ``order_col`` (then ``tiebreak_cols``) across the existing table
        and this batch.

        - DELTA mode: Delta's native MERGE (``DeltaTable.forPath ...
          whenMatchedUpdateAll/whenNotMatchedInsertAll``) — an O(changed
          files) transactional merge, the cluster-scale path. The batch
          must already be key-unique (the streaming sink reduces it with
          a window first); ``txn`` rides the same idempotent-write key as
          :meth:`append_table` for the no-table bootstrap write.
        - PARQUET mode: copy-on-write rewrite via :meth:`save_table`
          (the honest cost of upsert on immutable files).
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        order = [F.col(order_col).desc()] + [
            F.col(c).desc() for c in (tiebreak_cols or [])
        ]
        w = Window.partitionBy(*key_cols).orderBy(*order)
        reduced = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ent = self.tables().get(name)
        if meta is None:
            meta = dict((ent or {}).get("meta") or {})
        if self.fmt == "delta":
            self._require_delta(spark)
            if ent is None:
                # bootstrap: first batch creates the Delta table
                self.append_table(spark, name, reduced, meta, txn=txn)
                return
            from delta.tables import DeltaTable  # delta-spark runtime

            path = os.path.join(self.root, ent["dir"])
            cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
            # only overwrite when the incoming row wins the FULL
            # lexicographic (order_col, *tiebreak_cols) order — the
            # parquet path keeps the greatest such tuple across
            # existing+batch, so an existing row that ties on order_col
            # but wins the tiebreak must survive here too. The FINAL key
            # keeps >= (replay idempotence: re-delivering the winning
            # row must still match).
            ord_cols = [order_col] + list(tiebreak_cols or [])
            clauses = []
            for i, c in enumerate(ord_cols):
                eqs = [f"s.{p} = t.{p}" for p in ord_cols[:i]]
                cmp_op = ">=" if i == len(ord_cols) - 1 else ">"
                clauses.append(" AND ".join(eqs + [f"s.{c} {cmp_op} t.{c}"]))
            newer = " OR ".join(f"({cl})" for cl in clauses)
            (
                DeltaTable.forPath(spark, path)
                .alias("t")
                .merge(reduced.alias("s"), cond)
                .whenMatchedUpdate(
                    condition=newer,
                    set={c: f"s.{c}" for c in reduced.columns},
                )
                .whenNotMatchedInsertAll()
                .execute()
            )
            self._commit_entry(
                name,
                {
                    "dir": ent["dir"],
                    "version": "delta",
                    "delta_version": self._delta_log_version(spark, path),
                    "meta": meta,
                },
                ent,
            )
            return
        data = reduced
        if ent is not None:
            data = self.load_df(spark, name).unionByName(reduced)
        latest = (
            data.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        self.save_table(spark, name, latest, meta)

    def drop_table(self, name: str) -> None:
        ver, cat = self._latest_commit()
        base = cat["tables"].get(name)
        if base is None:
            return
        self._commit_entry(name, None, base)
        shutil.rmtree(os.path.join(self.root, base["dir"]), ignore_errors=True)

    # ------------------------------------------------- delta txn rollback
    def delta_table_versions(self, spark: SparkSession) -> dict[str, int]:
        """Current Delta-log version per table (BEGIN-time snapshot).

        The parquet path's ROLLBACK is a pure catalog restore — old
        version dirs still exist, so restoring the pointer restores the
        data. The DELTA path keeps one log per table ('version':
        'delta'), so a catalog restore alone would leave in-transaction
        DML visible; rollback must also rewind each advanced log via
        Delta RESTORE (public Delta Lake API: DeltaTable.history /
        restoreToVersion)."""
        if self.fmt != "delta":
            return {}
        self._require_delta(spark)
        from delta.tables import DeltaTable  # delta-spark runtime

        out: dict[str, int] = {}
        for name, ent in self.tables().items():
            path = os.path.join(self.root, ent["dir"])
            try:
                hist = DeltaTable.forPath(spark, path).history(1).collect()
            except Exception:  # noqa: BLE001 — dir not yet written
                continue
            if hist:
                out[name] = hist[0]["version"]
        return out

    def restore_delta_versions(
        self, spark: SparkSession, versions: dict[str, int]
    ) -> None:
        """ROLLBACK data path for delta tables: for every snapshotted
        table whose Delta log advanced during the transaction, rewind it
        with ``restoreToVersion`` (tables created inside the transaction
        are handled by the catalog restore — their logs become
        unreferenced, like aborted copy-on-write commits)."""
        if self.fmt != "delta" or not versions:
            return
        self._require_delta(spark)
        from delta.tables import DeltaTable  # delta-spark runtime

        for name, ver in versions.items():
            ent = self.tables().get(name)
            if ent is None:
                continue
            # Per-table try: a table whose directory vanished during the
            # transaction (drop_table rmtrees immediately) must not abort
            # the rollback of every REMAINING table — a partially applied
            # ROLLBACK is worse than skipping one unrestorable log.
            try:
                dt = DeltaTable.forPath(
                    spark, os.path.join(self.root, ent["dir"])
                )
                try:
                    cur = dt.history(1).collect()[0]["version"]
                except Exception:  # noqa: BLE001 — unreadable log: restore
                    cur = None
                if cur != ver:
                    dt.restoreToVersion(ver)
            except Exception:  # noqa: BLE001 — missing dir/log: skip table
                continue

    # --------------------------------------------------------------- views
    def views(self) -> dict[str, str]:
        """name -> DuckDB-dialect body SQL of persisted views."""
        return self._read_catalog().get("views", {})

    def save_view(self, name: str, body: str) -> None:
        while True:
            ver, cat = self._latest_commit()
            cat.setdefault("views", {})[name] = body
            if self._try_commit(ver + 1, cat):
                return

    def drop_view(self, name: str) -> None:
        while True:
            ver, cat = self._latest_commit()
            if name not in cat.get("views", {}):
                return
            cat["views"].pop(name, None)
            if self._try_commit(ver + 1, cat):
                return

    # ---------------------------------------------------------- time travel
    def commits(self) -> list[int]:
        """Sorted commit numbers present in the log (the versions a
        time-travel read can target, subject to GC retention)."""
        cdir = os.path.join(self.root, _COMMITS)
        try:
            return sorted(
                int(f[:-5]) for f in os.listdir(cdir) if f.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def catalog_at(self, number: int) -> dict:
        """The full catalog as of commit ``number``."""
        path = os.path.join(self.root, _COMMITS, f"{number:020d}.json")
        try:
            with open(path, "r", encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"no commit {number} in this warehouse "
                f"(log holds {self.commits() or 'nothing'})"
            ) from None

    def load_df_at(
        self, spark: SparkSession, name: str, number: int
    ) -> DataFrame:
        """Time-travel read: table ``name`` as of commit ``number`` —
        the commit log IS the version history (each commit references
        immutable version dirs, Delta/Iceberg's snapshot model in
        miniature). Readable as far back as GC retention keeps the
        data (_KEEP_COMMITS commits + the grace window); a pruned
        version raises a clear error rather than a partial read."""
        cat = self.catalog_at(number)
        ent = cat["tables"].get(name)
        if ent is None:
            raise ValueError(f"table {name!r} does not exist at commit {number}")
        if self.fmt == "delta":
            self._require_delta(spark)
            dv = ent.get("delta_version")
            if dv is None:
                # A pre-versioned commit entry (or an unreadable log at
                # write time) cannot be time-travelled: reading the
                # current snapshot here would be SILENTLY WRONG data.
                raise ValueError(
                    f"commit {number} of table {name!r} predates delta"
                    " version tracking (no delta_version in the commit"
                    " entry); the Delta log offers no mapping from this"
                    " catalog commit to a snapshot"
                )
            return (
                spark.read.format("delta")
                .option("versionAsOf", str(dv))
                .load(os.path.join(self.root, ent["dir"]))
            )
        v = ent["version"]
        segments = v if isinstance(v, list) else [v]
        paths = [os.path.join(self.root, ent["dir"], s) for s in segments]
        missing = [p for p in paths if not os.path.isdir(p)]
        if missing:
            raise ValueError(
                f"commit {number} of table {name!r} references data the "
                f"retention GC has pruned ({os.path.basename(missing[0])}); "
                f"only the last {_KEEP_COMMITS} commits are kept readable"
            )
        return spark.read.parquet(*paths)

    # ------------------------------------------------------------------ GC
    def _gc(self, name: str, tdir: str) -> None:
        """Remove version dirs of ``name`` that no recent commit references
        and that are older than the grace window (a concurrent writer may
        have staged a dir it hasn't committed yet — never delete that)."""
        cdir = os.path.join(self.root, _COMMITS)
        referenced: set[str] = set()
        try:
            nums = sorted(
                int(f[:-5]) for f in os.listdir(cdir) if f.endswith(".json")
            )[-_KEEP_COMMITS:]
        except FileNotFoundError:
            nums = []
        for n in nums:
            try:
                with open(
                    os.path.join(cdir, f"{n:020d}.json"), "r", encoding="utf-8"
                ) as f:
                    ent = json.load(f)["tables"].get(name)
                if ent and ent["dir"] == tdir:
                    v = ent["version"]
                    referenced.update(v if isinstance(v, list) else [v])
            except (OSError, ValueError, KeyError):
                continue
        base = os.path.join(self.root, tdir)
        try:
            candidates = os.listdir(base)
        except FileNotFoundError:
            return
        now = time.time()
        for v in candidates:
            p = os.path.join(base, v)
            if v in referenced or not v.startswith("v"):
                continue
            try:
                if now - os.path.getmtime(p) < self.gc_grace_s:
                    continue
            except OSError:
                continue
            shutil.rmtree(p, ignore_errors=True)
