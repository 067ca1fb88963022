"""Local replica of the driver's DuckDB-oracle differential check.

Stricter than the driver needs to be: values are compared *exactly*
(repr-level for floats), so anything green here should hash-match in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from simple_etl_spark.engine import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), normalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _arrow_family(t) -> str:
    """Collapse an Arrow type into the family the driver's value-hash
    distinguishes.  DuckDB HUGEINT surfaces as decimal128(38,0), which
    hashes differently from Spark's int64 even when values are equal
    (the round-1 `count_if` incident) — so decimal vs int vs float must
    not silently coalesce here the way `fetchall()` coalesces them."""
    import pyarrow.types as pt

    if pt.is_integer(t):
        # widths matter: the driver's value-hash distinguishes int32
        # from int64 (the round-2 `row_number` incident) — Spark
        # row_number() is int32, DuckDB's is int64, values identical,
        # hash different. Never collapse integer widths here.
        return f"int{t.bit_width}"
    if pt.is_floating(t):
        return f"float{t.bit_width}"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t):
        return "list<" + _arrow_family(t.value_type) + ">"
    if pt.is_struct(t):
        return "struct"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    return str(t)


def _spark_family(dt_str: str) -> str:
    """Map a Spark simpleString dtype to the same family space."""
    if dt_str == "tinyint":
        return "int8"
    if dt_str == "smallint":
        return "int16"
    if dt_str == "int":
        return "int32"
    if dt_str == "bigint":
        return "int64"
    if dt_str == "float":
        return "float32"
    if dt_str == "double":
        return "float64"
    if dt_str.startswith("decimal"):
        return "decimal"
    if dt_str == "boolean":
        return "bool"
    if dt_str in ("string", "varchar"):
        return "str"
    if dt_str.startswith("timestamp"):
        return "timestamp"
    if dt_str == "date":
        return "date"
    if dt_str.startswith("array<"):
        return "list<" + _spark_family(dt_str[6:-1]) + ">"
    if dt_str.startswith("struct"):
        return "struct"
    if dt_str == "binary":
        return "binary"
    return dt_str


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d_rel = con.sql(sql)
    d_cols = list(d_rel.columns)
    # Arrow-level fetch: fetchall() converts HUGEINT->int and masks the
    # type skew the driver's hash sees.  Check type families explicitly.
    d_tbl = d_rel.arrow()
    d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
    s_types = {f.name: _spark_family(f.dataType.simpleString()) for f in spark_df.schema.fields}
    d_types = {
        n.lower(): _arrow_family(d_tbl.schema.field(i).type)
        for i, n in enumerate(d_cols)
    }
    for name, fam in s_types.items():
        dfam = d_types.get(name, d_types.get(name.lower()))
        if dfam is not None and dfam != fam:
            return False, (
                f"type-family mismatch on '{name}': spark={fam} duck={dfam} "
                "(driver hashes these differently even when values match)"
            )

    if sorted(s_cols) != sorted(c.lower() for c in d_cols) and sorted(
        s_cols
    ) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    s = canonicalize(s_cols, [tuple(r) for r in s_rows])
    d = canonicalize(d_cols, d_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
