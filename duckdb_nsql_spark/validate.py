"""SQL validity checking — parse/bind only, no execution.

Port of the reference's validator semantics
(/root/reference/examples/validate_sql.py:6-27 and examples/utils.py:85-105):
classify failures as parser vs binder vs catalog errors, never touch data,
and block external access while checking. The reference runs this in a
subprocess with a 0.5 s timeout; here analysis is in-process (Spark's
analyzer is reentrant) with a soft timeout on our side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

QUERY_HEADS = ("SELECT", "WITH", "VALUES", "FROM", "TABLE", "EXPLAIN")
STMT_HEADS = QUERY_HEADS + (
    "CREATE", "INSERT", "UPDATE", "DELETE", "ALTER", "DROP", "COPY",
    "ATTACH", "DETACH", "USE", "PRAGMA", "CALL", "SET", "RESET",
    "SUMMARIZE", "DESCRIBE", "DESC", "SHOW", "BEGIN", "COMMIT", "ROLLBACK",
    "MERGE", "TRUNCATE", "PREPARE", "EXECUTE", "DEALLOCATE",
    "EXPORT", "IMPORT", "CHECKPOINT", "VACUUM", "ANALYZE",
    "START", "END", "ABORT", "PIVOT", "UNPIVOT", "COMMENT",
)


@dataclass
class ValidationResult:
    ok: bool
    category: Optional[str] = None  # parser | binder | catalog | unsupported
    error: Optional[str] = None


def validate_sql(session, sql: str) -> ValidationResult:
    """Check a DuckDB-dialect statement against the session's catalog
    without executing it. Queries go through the full rewrite pipeline
    and Spark's analyzer (spark.sql analysis is lazy — no job runs);
    side-effecting statements are structurally checked only.
    """
    stripped = re.sub(r"^\s*(--[^\n]*\n\s*)*", "", sql or "")
    if not stripped.strip():
        return ValidationResult(False, "parser", "empty statement")
    head = stripped.split(None, 1)[0].upper().rstrip(";")
    if head not in STMT_HEADS:
        return ValidationResult(False, "parser", f"unknown statement head {head!r}")

    if head in QUERY_HEADS:
        # sandbox: no external reads during validation (mirrors
        # enable_external_access=False in the reference's validator).
        # validate_only=True skips the exact-reservoir count() (no Spark
        # jobs beyond file schema inference), and any temp views the
        # rewrite registers for file table functions are dropped on exit.
        prev = session.settings.get("enable_external_access", "true")
        session.settings["enable_external_access"] = "false"
        prev_log = session._created_views_log
        session._created_views_log = []
        try:
            # the same SQL-level pre-passes _query applies — without them
            # the validator rejects statements the engine executes
            # (ASOF JOIN, UNION BY NAME, WHERE-on-select-alias). CTE
            # materialization is deliberately skipped: it is a pure
            # performance transform and the inline form analyzes the same.
            text_sql = session._expand_macros(stripped)
            asof = session._asof_rewrite(text_sql)
            if asof is not None:
                text_sql = asof
            ubn = session._union_by_name(text_sql)
            if ubn is not None:
                ubn.schema  # plan already built; analysis is the check
                return ValidationResult(True)
            wrapped = session._where_alias_wrap(text_sql)
            if wrapped is not None:
                text_sql = wrapped
            text = session._rewrite_query(text_sql, validate_only=True)
            df = session.spark.sql(text)
            df.schema  # forces analysis; no action, no job
            return ValidationResult(True)
        except PermissionError as e:
            return ValidationResult(False, "catalog", str(e))
        except Exception as e:  # noqa: BLE001 — classified below
            return ValidationResult(False, _classify(e), str(e).split("\n")[0][:500])
        finally:
            session.settings["enable_external_access"] = prev
            for view in session._created_views_log:
                try:
                    session.spark.catalog.dropTempView(view)
                except Exception:  # noqa: BLE001 — cleanup is best-effort
                    pass
            session._created_views_log = prev_log

    # non-query statements: structural check without applying side effects
    try:
        if head in ("INSERT", "UPDATE", "DELETE"):
            m = re.search(
                r"^\s*(?:INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+([\w.\"`]+)",
                stripped,
                re.IGNORECASE,
            )
            if m and session._resolve_table_key(m.group(1).strip('"`')) is None:
                return ValidationResult(
                    False, "catalog", f"table {m.group(1)} does not exist"
                )
        return ValidationResult(True)
    except Exception as e:  # noqa: BLE001
        return ValidationResult(False, _classify(e), str(e)[:500])


def _classify(e: Exception) -> str:
    name = type(e).__name__
    msg = str(e)
    if "PARSE_SYNTAX_ERROR" in msg or "ParseException" in name:
        return "parser"
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "Catalog" in msg:
        return "catalog"
    if "UNRESOLVED_COLUMN" in msg or "CANNOT_RESOLVE" in msg or "DATATYPE_MISMATCH" in msg:
        return "binder"
    if "AnalysisException" in name:
        return "binder"
    return "unsupported"
