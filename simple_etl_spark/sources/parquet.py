"""Parquet batch source with type canonicalization.

The engine's scan layer: schema quirks of the upstream files are
absorbed here so every downstream operator sees clean Spark types and
Catalyst retains predicate pushdown + column pruning (the fix-ups are
column-level casts layered on a plain parquet scan, so PushedFilters/
ReadSchema still reach the file scan for untouched columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tables whose parquet physical types need canonicalization.
# events.ts is INT64 TIMESTAMP(NANOS,false): Spark has no nanosecond
# timestamp type, so with spark.sql.legacy.parquet.nanosAsLong the
# column arrives as long and is truncated to microseconds here —
# matching DuckDB's nanos→micros truncation, so oracles agree.
_NANOS_TS_COLS = {"events": ["ts"]}


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame (no materialization)."""
    path = _path(sf_dir, name)
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if not nanos_cols:
        return spark.read.parquet(path)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtypes = dict(df.dtypes)  # forces schema resolution — a reader
        # that rejects NANOS falls through to the pyarrow path here
        for c in nanos_cols:
            # only fix up when the column actually arrived as raw nanos
            # (bigint); a re-laid-out copy of the table already carries
            # a proper timestamp and must pass through untouched
            if dtypes.get(c) == "bigint":
                df = df.withColumn(
                    c,
                    F.expr(f"cast(timestamp_micros({c} div 1000) as timestamp_ntz)"),
                )
        return df
    except Exception:
        return _load_via_arrow(spark, path)


def _load_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Fallback for parquet features Spark's reader rejects.

    Only used for small dimension-sized tables when the session's
    reader can't be configured; arrow→pandas keeps types.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    pdf = tbl.to_pandas()
    for col in pdf.columns:
        if str(pdf[col].dtype).startswith("datetime64[ns"):
            pdf[col] = pdf[col].astype("datetime64[us]")
    return spark.createDataFrame(pdf)
