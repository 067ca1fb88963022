"""Round-14 sf30 scale cells (VERDICT r13 #5).

One more decade above sf10 for the two heaviest non-skew shapes:

- ``gap``: stream_gap_sessions through the DEFAULT drain path (no
  env overrides except the harness timeout) — the auto-cutover must
  pick the parquet FileStreamSink on the ~530 MiB source, and the
  drained relation must digest-identical to the same gaps-and-islands
  computation run as a BATCH Spark plan (the "plain plan" twin),
  plus a 5-integer summary crosscheck against DuckDB for
  engine-independence (the full-row DuckDB compare is a driver-side
  collect of ~28M rows — exactly what the digest path exists to
  avoid; the sf10 point already did the full compare).
- ``clusters``: llm_dedup_clusters wall-time at sf30 under BOTH
  determinism configs (8 shuffle partitions + AQE on vs 200 + AQE
  off), digests required identical. The DuckDB recursive-CTE twin is
  skipped ON PURPOSE: it took ~23 min at sf10 and scales worse than
  the engine (SCALE.md §4) — identity across two independently
  planned executions is the affordable sf30 equality check.

The salted hot-key cells run through tools/skew_bench.py --base
/tmp/scaledata/sf30 (same harness as SKEW_r13, one more decade).

Usage: python tools/sf30_cells.py [gap|clusters] [--out SCALE_sf30.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digest import agg_hash  # noqa: E402

SF_DIR = "/tmp/scaledata/sf30"

# Spark-dialect twin of the stream_gap_sessions DuckDB oracle
# (stream_queries.py): unix_millis instead of epoch_ms, otherwise the
# same gaps-and-islands + watermark-closure shape.
BATCH_TWIN_SQL = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
), sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
), rolled AS (
    SELECT cast(user_id as string) AS key,
           unix_millis(min(ts)) AS start_ms,
           unix_millis(max(ts)) AS end_ms,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
)
SELECT key, start_ms, end_ms, n_events
FROM rolled, (SELECT unix_millis(max(ts)) AS m FROM events)
WHERE end_ms + 1800000 < m
"""

DUCK_SUMMARY_SQL = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
), sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
), rolled AS (
    SELECT cast(user_id as varchar) AS key,
           epoch_ms(min(ts)) AS start_ms,
           epoch_ms(max(ts)) AS end_ms,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
), final AS (
    SELECT key, start_ms, end_ms, n_events
    FROM rolled, (SELECT epoch_ms(max(ts)) AS m FROM events)
    WHERE end_ms + 1800000 < m
)
SELECT count(*) AS c, sum(n_events) AS se, sum(start_ms) AS ss,
       sum(end_ms) AS see, count(DISTINCT key) AS dk
FROM final
"""


def _emit(out: str, rec: dict) -> None:
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cell_gap(out: str) -> None:
    from simple_etl_spark import queries as Q
    from simple_etl_spark.engine import get_spark

    Q._load_all()
    spark = get_spark("sf30-gap")
    t0 = time.perf_counter()
    df = Q.REGISTRY["stream_gap_sessions"].fn(spark, SF_DIR)
    drain_s = time.perf_counter() - t0
    h_stream, n_stream = agg_hash(df)

    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")) \
        .createOrReplaceTempView("events")
    twin = spark.sql(BATCH_TWIN_SQL)
    t0 = time.perf_counter()
    _noop(twin)
    batch_s = time.perf_counter() - t0
    h_batch, n_batch = agg_hash(twin)

    # engine-independent 5-integer summary via DuckDB
    from pyspark.sql import functions as F

    srow = df.agg(
        F.count("*").alias("c"), F.sum("n_events").alias("se"),
        F.sum("start_ms").alias("ss"), F.sum("end_ms").alias("see"),
        F.countDistinct("key").alias("dk"),
    ).collect()[0]
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{SF_DIR}/events.parquet'"
    )
    drow = con.execute(DUCK_SUMMARY_SQL).fetchone()
    summary_match = (
        [srow["c"], srow["se"], srow["ss"], srow["see"], srow["dk"]]
        == [int(v) for v in drow]
    )
    _emit(out, {
        "cell": "stream_gap_sessions_sf30",
        "drain_s": round(drain_s, 1),
        "batch_twin_s": round(batch_s, 1),
        "rows": n_stream,
        "hash_identical": h_stream == h_batch and n_stream == n_batch,
        "duckdb_summary_match": bool(summary_match),
        "drain_partitions": os.environ.get(
            "SPARK_GRAFT_DRAIN_PARTITIONS", "default(8)"),
    })
    spark.stop()


def cell_clusters(out: str) -> None:
    from simple_etl_spark import queries as Q
    from simple_etl_spark.engine import ensure_runtime_confs, get_spark

    Q._load_all()
    spark = get_spark("sf30-clusters")
    results = {}
    for tag, parts, aqe in (("cfgA", "8", "true"), ("cfgB", "200", "false")):
        s2 = spark.newSession()
        ensure_runtime_confs(s2)
        s2.conf.set("spark.sql.shuffle.partitions", parts)
        s2.conf.set("spark.sql.adaptive.enabled", aqe)
        df = Q.REGISTRY["llm_dedup_clusters"].fn(s2, SF_DIR)
        t0 = time.perf_counter()
        _noop(df)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(df)
        t2 = time.perf_counter() - t0
        h, n = agg_hash(df)
        results[tag] = (min(t1, t2), h, n)
        _emit(out, {
            "cell": f"llm_dedup_clusters_sf30_{tag}",
            "partitions": parts, "aqe": aqe,
            "first_s": round(t1, 1), "second_s": round(t2, 1),
            "rows": n,
        })
    (ta, ha, na), (tb, hb, nb) = results["cfgA"], results["cfgB"]
    _emit(out, {
        "cell": "llm_dedup_clusters_sf30",
        "warm_min_s": round(min(ta, tb), 1),
        "hash_identical": ha == hb and na == nb,
        "rows": na,
    })
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cell", choices=["gap", "clusters"])
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_sf30.jsonl"))
    a = ap.parse_args()
    {"gap": cell_gap, "clusters": cell_clusters}[a.cell](a.out)


if __name__ == "__main__":
    main()
