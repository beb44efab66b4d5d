"""SQL validity checking — parse/bind only, no execution.

Port of the reference's validator semantics
(/root/reference/examples/validate_sql.py:6-27 and examples/utils.py:88-105):
classify failures as parser vs binder vs catalog errors, never touch data,
and block external access while checking. The reference runs the check in
a subprocess with a 0.5 s deadline and treats a timeout as SUCCESS
("parsing and binding was very likely successful", utils.py:102-105);
here the check runs on a daemon thread with a (larger — Spark analysis
is slower than DuckDB's parser) deadline and the same timeout-means-valid
contract. Non-query statements are parsed through the ENGINE'S OWN
parsers (``_parse_coldefs``, type parsing, the COPY/MERGE shapes) with
side effects suppressed, so malformed DDL is rejected as ``parser``
rather than waved through on a head-keyword match.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass
from typing import Optional

from .frontend.tokenizer import (
    COMMENT,
    IDENT,
    QIDENT,
    WS,
    match_forward,
    render,
    tokenize,
)
from .types import parse_duckdb_type

QUERY_HEADS = ("SELECT", "WITH", "VALUES", "FROM", "TABLE", "EXPLAIN")
STMT_HEADS = QUERY_HEADS + (
    "CREATE", "INSERT", "UPDATE", "DELETE", "ALTER", "DROP", "COPY",
    "ATTACH", "DETACH", "USE", "PRAGMA", "CALL", "SET", "RESET",
    "SUMMARIZE", "DESCRIBE", "DESC", "SHOW", "BEGIN", "COMMIT", "ROLLBACK",
    "MERGE", "TRUNCATE", "PREPARE", "EXECUTE", "DEALLOCATE",
    "EXPORT", "IMPORT", "CHECKPOINT", "VACUUM", "ANALYZE",
    "START", "END", "ABORT", "PIVOT", "UNPIVOT", "COMMENT",
)

# Spark's analyzer needs more headroom than DuckDB's parser (the
# reference budget is 0.5 s against an in-process C++ parser); the
# SEMANTICS carry over unchanged: deadline hit => treat as valid.
DEFAULT_TIMEOUT_S = 10.0

# sentinel table name for side-effect-suppressed coldef parsing
_SENTINEL = "__validate_coldefs__"

# session dicts _parse_coldefs may write under the table-name key
_COLDEF_STATE = (
    "_checks", "_unique_keys", "_defaults", "_notnull_cols",
    "_foreign_keys", "_enum_cols", "_type_overrides", "_fixed_arrays",
)


@dataclass
class ValidationResult:
    ok: bool
    category: Optional[str] = None  # parser | binder | catalog | unsupported
    error: Optional[str] = None


def validate_sql(
    session, sql: str, timeout_s: Optional[float] = DEFAULT_TIMEOUT_S
) -> ValidationResult:
    """Check a DuckDB-dialect statement against the session's catalog
    without executing it, within ``timeout_s`` seconds.

    Queries go through the full rewrite pipeline and Spark's analyzer
    (spark.sql analysis is lazy — no job runs); side-effecting
    statements are parsed structurally through the engine's own parsers
    with side effects suppressed. ``timeout_s=None`` disables the
    deadline (runs inline on the calling thread).
    """
    if timeout_s is None:
        return _validate(session, sql)
    box: list[ValidationResult] = []

    def work() -> None:
        try:
            box.append(_validate(session, sql))
        except BaseException as e:  # noqa: BLE001 — thread must not die mute
            box.append(
                ValidationResult(False, "unsupported", str(e)[:500])
            )

    t = threading.Thread(target=work, daemon=True, name="validate-sql")
    t.start()
    t.join(timeout_s)
    if not box:
        # Deadline hit with analysis still in flight. The reference's
        # subprocess validator returns True here (utils.py:102-105) —
        # a statement that parses+binds long is overwhelmingly a VALID
        # expensive one, not a syntax error (parsers fail fast). The
        # daemon worker holds no engine locks the caller needs; it
        # finishes in the background or dies with the process.
        return ValidationResult(True)
    return box[0]


def _validate(session, sql: str) -> ValidationResult:
    stripped = re.sub(r"^\s*(--[^\n]*\n\s*)*", "", sql or "")
    if not stripped.strip():
        return ValidationResult(False, "parser", "empty statement")
    head = stripped.split(None, 1)[0].upper().rstrip(";")
    if head not in STMT_HEADS:
        return ValidationResult(False, "parser", f"unknown statement head {head!r}")

    if head in QUERY_HEADS:
        return _validate_query(session, stripped)

    # non-query statements: the engine's own structural parsers, with
    # side effects suppressed (no catalog writes, no data movement)
    try:
        if head == "CREATE":
            return _validate_create(session, stripped)
        if head == "COPY":
            return _validate_copy(session, stripped)
        if head == "ALTER":
            return _validate_alter(session, stripped)
        if head == "DROP":
            return _validate_drop(session, stripped)
        if head == "MERGE":
            m = re.match(
                r"^\s*MERGE\s+INTO\s+([\w.\"`]+)", stripped, re.IGNORECASE
            )
            if not m or not re.search(r"\bUSING\b", stripped, re.IGNORECASE):
                return ValidationResult(
                    False, "parser", "malformed MERGE (INTO <t> USING ...)"
                )
            if session._resolve_table_key(m.group(1).strip('"`')) is None:
                return ValidationResult(
                    False, "catalog", f"table {m.group(1)} does not exist"
                )
            return ValidationResult(True)
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
            if head == "INSERT":
                # INSERT INTO t [BY NAME] [(cols)] SELECT ... — the source
                # query binds like any query
                q = re.search(r"\b(SELECT|WITH|FROM)\b", stripped[6:], re.IGNORECASE)
                if q:
                    return _validate_query(session, stripped[6 + q.start():])
            return ValidationResult(True)
        return ValidationResult(True)
    except Exception as e:  # noqa: BLE001
        return ValidationResult(False, _classify(e), str(e)[:500])


def _validate_query(session, text_sql: str) -> ValidationResult:
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
        text_sql = session._expand_macros(text_sql)
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


def _parse_coldefs_pure(session, body_tokens) -> None:
    """Run the engine's CREATE TABLE column-definition parser against a
    sentinel table name, then purge every constraint/metadata entry it
    recorded — full parse fidelity (types, constraints, DEFAULT exprs,
    fixed arrays, enums), zero side effects."""
    try:
        session._parse_coldefs(body_tokens, _SENTINEL)
    finally:
        for attr in _COLDEF_STATE:
            d = getattr(session, attr, None)
            if isinstance(d, dict):
                d.pop(_SENTINEL, None)


def _sig_words(tokens):
    sig = [i for i, t in enumerate(tokens) if t.kind not in (WS, COMMENT)]
    words = [
        tokens[i].upper if tokens[i].kind == IDENT else tokens[i].text
        for i in sig
    ]
    return sig, words


def _validate_create(session, stripped: str) -> ValidationResult:
    tokens = tokenize(stripped)
    sig, words = _sig_words(tokens)
    j = 1
    if j + 1 < len(words) and words[j] == "OR" and words[j + 1] == "REPLACE":
        j += 2
    if j < len(words) and words[j] in ("TEMP", "TEMPORARY"):
        j += 1
    if j >= len(words):
        return ValidationResult(False, "parser", "truncated CREATE")
    kind = words[j]
    j += 1
    if kind in (
        "MACRO", "FUNCTION", "TYPE", "SEQUENCE", "DATABASE", "SCHEMA",
        "INDEX", "UNIQUE",
    ):
        # object kinds with their own executors; head-level shape only
        return ValidationResult(True)
    if kind not in ("TABLE", "VIEW"):
        return ValidationResult(
            False, "parser", f"unsupported CREATE {kind}"
        )
    if j + 2 < len(words) and words[j] == "IF":
        j += 3  # IF NOT EXISTS
    # qualified name
    if j >= len(sig) or tokens[sig[j]].kind not in (IDENT, QIDENT):
        return ValidationResult(False, "parser", "missing object name")
    while j + 2 < len(sig) and tokens[sig[j + 1]].text == ".":
        j += 2
    j += 1
    if j >= len(sig):
        return ValidationResult(
            False, "parser", f"CREATE {kind} without a body"
        )
    nxt = words[j]
    if nxt == "CLUSTER":  # CLUSTER BY (cols) [INTO n BUCKETS] AS ...
        if j + 1 >= len(sig) or words[j + 1] != "BY" or (
            j + 2 >= len(sig) or tokens[sig[j + 2]].text != "("
        ):
            return ValidationResult(
                False, "parser", "CLUSTER BY requires a (column list)"
            )
        c = match_forward(tokens, sig[j + 2], "(", ")")
        while j < len(sig) and sig[j] <= c:
            j += 1
        if j + 2 < len(sig) and words[j] == "INTO" and words[j + 2] == "BUCKETS":
            j += 3
        nxt = words[j] if j < len(sig) else ""
    if nxt == "AS":
        inner = render(tokens[sig[j] + 1:]).strip().rstrip(";").strip()
        if inner.startswith("(") and inner.endswith(")"):
            inner = inner[1:-1]
        return _validate_query(session, inner)
    if tokens[sig[j]].text == "(":
        c = match_forward(tokens, sig[j], "(", ")")
        try:
            _parse_coldefs_pure(session, tokens[sig[j] + 1: c])
        except ValueError as e:
            # unsupported type name / malformed definition — the same
            # class DuckDB's ParserException covers for bad DDL
            return ValidationResult(False, "parser", str(e)[:500])
        return ValidationResult(True)
    return ValidationResult(
        False, "parser", f"CREATE {kind}: expected (coldefs) or AS <query>"
    )


def _validate_copy(session, stripped: str) -> ValidationResult:
    tokens = tokenize(stripped)
    sig, words = _sig_words(tokens)
    if len(sig) < 2:
        return ValidationResult(False, "parser", "truncated COPY")
    # COPY (query) TO 'path' (opts) | COPY tbl TO/FROM 'path' (opts)
    if tokens[sig[1]].text == "(":
        c = match_forward(tokens, sig[1], "(", ")")
        inner = render(tokens[sig[1] + 1: c]).strip()
        r = _validate_query(session, inner)
        if not r.ok:
            return r
        after = [i for i in sig if tokens[i].kind not in (WS, COMMENT) and i > c]
        if not after or tokens[after[0]].upper != "TO":
            return ValidationResult(
                False, "parser", "COPY (query) must be followed by TO"
            )
        return ValidationResult(True)
    if not re.search(r"\b(TO|FROM)\b", stripped, re.IGNORECASE):
        return ValidationResult(
            False, "parser", "COPY requires a TO or FROM clause"
        )
    tname = tokens[sig[1]].text.strip('"`')
    direction = next(
        (w for w in words[2:] if w in ("TO", "FROM")), None
    )
    if direction == "TO" and session._resolve_table_key(tname) is None:
        return ValidationResult(
            False, "catalog", f"table {tname} does not exist"
        )
    return ValidationResult(True)


def _validate_alter(session, stripped: str) -> ValidationResult:
    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.\"`]+)\s+(.*)$",
        stripped,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        return ValidationResult(False, "parser", "malformed ALTER TABLE")
    if_exists, tname, rest = m.group(1), m.group(2).strip('"`'), m.group(3)
    if session._resolve_table_key(tname) is None and not if_exists:
        return ValidationResult(
            False, "catalog", f"table {tname} does not exist"
        )
    # type positions parse through the engine's type parser
    tm = re.search(
        r"\b(?:SET\s+DATA\s+TYPE|TYPE)\s+(.+?)(?:\s+USING\b|;|$)",
        rest,
        re.IGNORECASE | re.DOTALL,
    ) or re.search(
        r"\bADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?[\w\"`]+\s+(.+?)"
        r"(?:\s+DEFAULT\b|;|$)",
        rest,
        re.IGNORECASE | re.DOTALL,
    )
    if tm:
        try:
            parse_duckdb_type(tm.group(1).strip())
        except ValueError as e:
            return ValidationResult(False, "parser", str(e)[:500])
    return ValidationResult(True)


def _validate_drop(session, stripped: str) -> ValidationResult:
    m = re.match(
        r"^\s*DROP\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([\w.\"`]+)",
        stripped,
        re.IGNORECASE,
    )
    if m is None:
        return ValidationResult(True)  # DROP SCHEMA/INDEX/...: shape only
    kind, if_exists, name = m.group(1), m.group(2), m.group(3).strip('"`')
    if if_exists:
        return ValidationResult(True)
    if session._resolve_table_key(name) is None:
        return ValidationResult(
            False, "catalog", f"{kind.lower()} {name} does not exist"
        )
    return ValidationResult(True)


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
