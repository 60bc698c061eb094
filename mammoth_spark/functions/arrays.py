"""pg_array_to_json (A21) — Postgres array text format -> JSON.

The reference parses PG's ``{a,b}`` / ``{{one,two},{three,four}}`` text
format (quotes, backslash escapes, NULL tokens, arbitrary nesting) into
JSON text (reference target/common/arraytojson/arraytojson.go:10-77);
golden cases in arraytojson_test.go:9-51. An empty string (the null
representation on the CSV path) passes through unchanged.

The parser is a small recursive-descent routine — genuinely not
expressible with built-in expressions for the general nested/quoted case —
exposed as an Arrow-batched pandas UDF so it vectorizes per batch. For the
common 1-D unquoted case there is also ``pg_array_to_json_simple``, a pure
column expression that stays in codegen (use it when the schema says the
column can't contain quotes/nesting).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _parse_pg_array(src: str) -> tuple[list, int]:
    """Parse one {...} array starting at src[0]; returns (value, consumed).

    Mirrors the element grammar of the reference parser
    (arraytojson.go:22-76): elements split on commas at depth 1; double
    quotes protect commas/braces with backslash escapes; the bare token
    NULL (unquoted) is null.
    """
    assert src[0] == "{"
    out: list = []
    i = 1
    token: list[str] = []
    quoted_token = False

    def flush():
        nonlocal token, quoted_token
        if token or quoted_token:
            s = "".join(token)
            if not quoted_token and s == "NULL":
                out.append(None)
            elif not quoted_token and s == "":
                pass
            else:
                out.append(s)
        token = []
        quoted_token = False

    while i < len(src):
        ch = src[i]
        if ch == "{":
            sub, used = _parse_pg_array(src[i:])
            out.append(sub)
            i += used
        elif ch == "}":
            flush()
            return out, i + 1
        elif ch == ",":
            flush()
            i += 1
        elif ch == '"':
            quoted_token = True
            i += 1
            while i < len(src):
                if src[i] == "\\":
                    token.append(src[i + 1])
                    i += 2
                elif src[i] == '"':
                    i += 1
                    break
                else:
                    token.append(src[i])
                    i += 1
        else:
            token.append(ch)
            i += 1
    raise ValueError(f"unterminated postgres array literal: {src!r}")


def pg_array_text_to_json(src: str | None) -> str | None:
    """Scalar: PG array text -> JSON text; ''/None pass through (the
    reference treats empty string as null, snowflake_target.go:659-663)."""
    if src is None or src == "":
        return src
    if not src.startswith("{"):
        raise ValueError(f"not a postgres array literal: {src!r}")
    value, used = _parse_pg_array(src)
    if used != len(src):
        raise ValueError(f"trailing garbage in array literal: {src!r}")
    return json.dumps(value, separators=(",", ":"))


def _pg_array_to_json_batch(src: pd.Series) -> pd.Series:
    return src.map(pg_array_text_to_json, na_action="ignore")


def pg_array_to_json(col: Column) -> Column:
    """Arrow-batched column form of :func:`pg_array_text_to_json`.

    The pandas UDF is constructed lazily (registration needs an active
    SparkSession, which module import must not require).
    """
    from pyspark.sql import types as T

    fn = pandas_udf(_pg_array_to_json_batch, T.StringType())
    return fn(col)


def pg_array_to_json_simple(col: Column) -> Column:
    """Fast path for 1-D arrays with no quotes/escapes/nesting: pure
    expression (split + to_json), stays inside whole-stage codegen."""
    inner = F.regexp_replace(col, r"^\{|\}$", "")
    elems = F.when(inner == "", F.array().cast("array<string>")).otherwise(F.split(inner, ","))
    elems = F.transform(elems, lambda e: F.when(e == "NULL", F.lit(None)).otherwise(e))
    return F.when(col.isNull() | (col == ""), col).otherwise(F.to_json(elems))
