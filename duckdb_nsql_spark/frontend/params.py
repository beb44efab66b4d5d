"""Prepared-statement parameter binding, duckdb.Connection-compatible.

DuckDB's Python API (``con.execute(sql, parameters)``, public docs /
``duckdb/duckdb_connection.py`` signatures) accepts three placeholder
styles — ``?`` positional, ``$1`` numbered, ``$name`` named — with a
list/tuple for the first two and a dict for the third. We bind by
rendering each Python value as a SQL literal and splicing it over the
placeholder token, using the dialect tokenizer so ``?`` inside strings
or comments is never touched. Literal splicing (rather than a Spark
parameterized plan) keeps binding independent of which downstream path
(rewrite passes, session DDL handlers, DuckDB oracles) consumes the
text, and every value goes through one quoting function.
"""

from __future__ import annotations

import datetime
import math
from typing import Any, Mapping, Sequence

from .tokenizer import (
    COMMENT,
    IDENT,
    NUMBER,
    PUNCT,
    STRING,
    WS,
    Token,
    render,
    tokenize,
)


def render_literal(v: Any) -> str:
    """Render a Python value as a DuckDB/Spark-compatible SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}inf' AS DOUBLE)"
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bytes):
        # DuckDB blob literal: '\xAB...'::BLOB ; Spark path decodes via
        # the same rewrite that handles literal blobs.
        hexed = "".join(f"\\x{b:02X}" for b in v)
        return f"'{hexed}'::BLOB"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, datetime.time):
        return f"TIME '{v.isoformat()}'"
    if isinstance(v, datetime.timedelta):
        total = v.total_seconds()
        return f"INTERVAL {total} SECOND" if total == int(total) else (
            f"INTERVAL '{total}' SECOND"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(render_literal(x) for x in v) + "]"
    if isinstance(v, Mapping):
        entries = ", ".join(
            f"{render_literal(str(k))}: {render_literal(val)}"
            for k, val in v.items()
        )
        return "MAP {" + entries + "}"
    if isinstance(v, (set, frozenset)):
        return "[" + ", ".join(sorted(render_literal(x) for x in v)) + "]"
    # decimal.Decimal and anything str()-able with numeric repr
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    raise TypeError(
        f"cannot bind parameter of type {type(v).__name__}: {v!r}"
    )


def bind_parameters(sql: str, parameters: Any) -> str:
    """Splice ``parameters`` over ``?`` / ``$1`` / ``$name`` placeholders.

    Mixing ``?`` with ``$``-style in one statement is rejected, matching
    DuckDB's own binder error.
    """
    tokens = tokenize(sql)
    out: list[Token] = []
    n = len(tokens)
    positional_used = 0
    saw_qmark = False
    saw_dollar = False
    is_mapping = isinstance(parameters, Mapping)
    seq: Sequence[Any] = (
        parameters if isinstance(parameters, (list, tuple)) else []
    )
    i = 0
    while i < n:
        t = tokens[i]
        if t.kind in (WS, COMMENT, STRING):
            out.append(t)
            i += 1
            continue
        if t.kind == PUNCT and t.text == "?":
            saw_qmark = True
            if saw_dollar:
                raise ValueError(
                    "Invalid Input Error: Mixing named and positional "
                    "parameters is not supported yet"
                )
            if is_mapping or positional_used >= len(seq):
                raise ValueError(
                    "Invalid Input Error: Values were not provided for "
                    f"the following prepared statement parameter: "
                    f"{positional_used + 1}"
                )
            out.append(Token(IDENT, render_literal(seq[positional_used])))
            positional_used += 1
            i += 1
            continue
        if t.kind == PUNCT and t.text == "$" and i + 1 < n:
            nxt = tokens[i + 1]
            if nxt.kind == NUMBER and "." not in nxt.text:
                saw_dollar = True
                if saw_qmark:
                    raise ValueError(
                        "Invalid Input Error: Mixing named and positional "
                        "parameters is not supported yet"
                    )
                idx = int(nxt.text) - 1
                if is_mapping or idx < 0 or idx >= len(seq):
                    raise ValueError(
                        "Invalid Input Error: Values were not provided "
                        "for the following prepared statement parameter: "
                        f"{nxt.text}"
                    )
                out.append(Token(IDENT, render_literal(seq[idx])))
                i += 2
                continue
            if nxt.kind == IDENT:
                saw_dollar = True
                if saw_qmark:
                    raise ValueError(
                        "Invalid Input Error: Mixing named and positional "
                        "parameters is not supported yet"
                    )
                if not is_mapping or nxt.text not in parameters:
                    raise ValueError(
                        "Invalid Input Error: Values were not provided "
                        "for the following prepared statement parameter: "
                        f"{nxt.text}"
                    )
                out.append(Token(IDENT, render_literal(parameters[nxt.text])))
                i += 2
                continue
        out.append(t)
        i += 1
    if saw_qmark and not is_mapping and positional_used < len(seq):
        # DuckDB errors when MORE values than placeholders are supplied
        raise ValueError(
            "Invalid Input Error: Prepared statement needs "
            f"{positional_used} parameters, {len(seq)} given"
        )
    if not (saw_qmark or saw_dollar) and (
        (is_mapping and parameters) or len(seq)
    ):
        raise ValueError(
            "Invalid Input Error: Prepared statement needs 0 parameters, "
            f"{len(parameters)} given"
        )
    return render(tokens=out)
