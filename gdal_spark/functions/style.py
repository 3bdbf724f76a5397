"""OGR feature style strings (ogr/ogrfeaturestyle.cpp; the OGR_STYLE
special field): ``TOOL(param:value,param:value);TOOL(...)`` with four
tools — PEN / BRUSH / SYMBOL / LABEL — whose valid parameter tokens are
the reference's OGRStyleParamId registries (ogrfeaturestyle.cpp:37-96).

Parsing semantics mirror the reference:

* parts split on ';' HONOURING quoted strings (CSLTokenizeString2
  CSLT_HONOURSTRINGS), likewise params on ',' and key:value on the first
  ':' outside quotes;
* quoted values unescape ``\\"`` and ``\\\\``;
* boolean parameters given without a value parse as "1" (legacy
  behavior, ogrfeaturestyle.cpp Parse);
* malformed elements and unknown parameter tokens are skipped, not
  fatal;
* georeferenced parameters carry a unit suffix — g, px, pt, mm, cm, in
  (OGRSTUnitId) — split off by ``split_unit``.

Spark surface: ``parse_style`` is a vectorized Arrow UDF returning
``array<struct<tool string, params map<string,string>>>``;
``style_param`` extracts one tool's parameter as a plain string column.
Style strings are tiny per-feature metadata — this is map-only."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import (ArrayType, MapType, StringType, StructField,
                               StructType)

# ogrfeaturestyle.cpp:37-96 — (token, is_georef) per tool
TOOL_PARAMS = {
    "PEN": {"c": False, "w": True, "p": False, "id": False, "dp": True,
            "cap": False, "j": False, "l": False},
    "BRUSH": {"fc": False, "bc": False, "id": False, "a": False, "s": True,
              "dx": True, "dy": True, "l": False},
    "SYMBOL": {"id": False, "a": False, "c": False, "s": True, "dx": True,
               "dy": True, "ds": True, "dp": True, "di": True, "l": False,
               "f": False, "o": False},
    "LABEL": {"f": False, "s": True, "t": False, "a": False, "c": False,
              "b": False, "m": False, "p": False, "dx": True, "dy": True,
              "dp": True, "bo": False, "it": False, "un": False, "l": False,
              "st": False, "w": False, "h": False, "o": False},
}

# OGRSTUnitId suffixes (ogr_featurestyle.h / SetInternalInputUnitFromParam)
UNITS = ("px", "pt", "mm", "cm", "in", "g")


def _split_quoted(s: str, sep: str):
    """Split on ``sep`` outside double quotes, honoring backslash
    escapes (CSLT_HONOURSTRINGS)."""
    parts, cur, inq, esc = [], [], False, False
    for ch in s:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            cur.append(ch)
            esc = True
        elif ch == '"':
            cur.append(ch)
            inq = not inq
        elif ch == sep and not inq:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        v = v[1:-1]
        return v.replace('\\"', '"').replace("\\\\", "\\")
    return v


def parse_style_string(style: str):
    """Style string -> [(tool, {token: value_str}), ...].  Unknown tools
    and malformed elements are skipped like the reference's parser."""
    if not style:
        return []
    out = []
    for part in _split_quoted(style, ";"):
        part = part.strip()
        if not part:
            continue
        lp = part.find("(")
        if lp < 0 or not part.endswith(")"):
            continue
        tool = part[:lp].strip().upper()
        if tool not in TOOL_PARAMS:
            continue
        valid = TOOL_PARAMS[tool]
        params = {}
        for elem in _split_quoted(part[lp + 1 : -1], ","):
            if not elem.strip():
                continue
            kv = _split_quoted(elem, ":")
            key = kv[0].strip().lower()
            if key not in valid:
                continue  # unknown token skipped (reference warns + skips)
            # boolean params without a value parse as "1" (legacy)
            val = ":".join(kv[1:]) if len(kv) > 1 else "1"
            params[key] = _unquote(val)
        out.append((tool, params))
    return out


def split_unit(value: str):
    """'5px' -> (5.0, 'px'); unsuffixed georef values default to MM per
    the reference's ground-unit handling ('g' stays symbolic)."""
    v = value.strip()
    for u in UNITS:
        if v.endswith(u):
            try:
                return float(v[: -len(u)]), u
            except ValueError:
                return None, u
    try:
        return float(v), "mm"
    except ValueError:
        return None, None


_STYLE_SCHEMA = ArrayType(StructType([
    StructField("tool", StringType()),
    StructField("params", MapType(StringType(), StringType())),
]))


def parse_style(col) -> Column:
    """Vectorized OGR style parser: string column -> array of
    (tool, params map) structs."""

    @F.pandas_udf(_STYLE_SCHEMA)
    def udf(s: pd.Series) -> pd.Series:
        return pd.Series([
            [{"tool": t, "params": p} for t, p in parse_style_string(v)]
            if v is not None else []
            for v in s
        ])

    return udf(col if isinstance(col, Column) else F.col(col))


def style_param(col, tool: str, param: str) -> Column:
    """GetStyleParam analogue: the FIRST matching tool part's parameter
    value as a string column (null when absent)."""

    @F.pandas_udf(StringType())
    def udf(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            got = None
            if v is not None:
                for t, p in parse_style_string(v):
                    if t == tool.upper() and param in p:
                        got = p[param]
                        break
            out.append(got)
        return pd.Series(out)

    return udf(col if isinstance(col, Column) else F.col(col))
