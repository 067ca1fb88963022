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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d_rel = con.sql(sql)
    d_cols = list(d_rel.columns)
    d_rows = d_rel.fetchall()

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
