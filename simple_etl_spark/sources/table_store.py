"""Versioned parquet table store — Delta-lite snapshot semantics.

Merging into a parquet table naively means overwriting the directory
the merge is reading from, which Spark (correctly) refuses and which
is unrecoverable if the job dies mid-write. The standard fix (SURVEY
§7.3 "merge-on-parquet atomicity") is the snapshot-log layout every
table format uses: each write lands in a fresh ``v{N}`` directory and
a tiny pointer file is swapped last, so readers always see a complete
snapshot, a crashed write is invisible, and the read-modify-write
merge never touches the files it is scanning. At 100 TB the data copy
is the merge itself (unavoidable without a row-level format); the
pointer swap stays O(1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_VERSION"


def _pointer_file(base: str) -> str:
    return os.path.join(base, _POINTER)


def current_version(base: str) -> int | None:
    try:
        with open(_pointer_file(base)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def table_path(base: str) -> str | None:
    """Resolve the current snapshot directory, or None if absent."""
    v = current_version(base)
    return os.path.join(base, f"v{v}") if v is not None else None


def read_table(spark: SparkSession, base: str) -> DataFrame | None:
    path = table_path(base)
    return spark.read.parquet(path) if path else None


def write_table(
    df: DataFrame, base: str, partition_by: list[str] | None = None
) -> str:
    """Write a new snapshot and swap the pointer (commit point).

    The data write is the slow, distributed part; the pointer update
    is a single tiny file replace — readers either resolve the old
    complete snapshot or the new one, never a half-written mix.
    """
    v = (current_version(base) or 0) + 1
    path = os.path.join(base, f"v{v}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    os.makedirs(base, exist_ok=True)
    tmp = _pointer_file(base) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, _pointer_file(base))  # atomic on POSIX
    return path


def vacuum(base: str, keep: int = 1) -> list[str]:
    """Drop snapshots older than the newest ``keep`` (the retention
    delete S12 for the store itself). Returns removed paths."""
    import shutil

    cur = current_version(base)
    if cur is None:
        return []
    removed = []
    for name in os.listdir(base):
        if name.startswith("v") and name[1:].isdigit():
            v = int(name[1:])
            if v <= cur - keep:
                p = os.path.join(base, name)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed
