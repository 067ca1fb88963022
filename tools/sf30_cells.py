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
WITH src AS (
    -- the generated parquet is tz-less (TIMESTAMP_NTZ); the session
    -- is pinned UTC, so the instant cast is lossless and matches the
    -- drain's EVENT_SCHEMA read
    SELECT user_id, cast(ts AS timestamp) AS ts FROM events
), marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM src
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
FROM rolled, (SELECT unix_millis(max(ts)) AS m FROM src)
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

    # decimal sums: 28.6M rows x ~1.7e12 ms overflows int64
    srow = df.agg(
        F.count("*").alias("c"), F.sum("n_events").alias("se"),
        F.sum(F.col("start_ms").cast("decimal(38,0)")).alias("ss"),
        F.sum(F.col("end_ms").cast("decimal(38,0)")).alias("see"),
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
        [int(srow["c"]), int(srow["se"]), int(srow["ss"]),
         int(srow["see"]), int(srow["dk"])]
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


def _clusters_capped(spark, max_bucket, cap_stats=None):
    """The graded llm_dedup_clusters lineage with the production
    bucket cap: the sf30 synthetic corpus saturates its shingle
    universe (29,791 distinct 3-gram shingles at BOTH sf10 and sf30
    — the 31-word generator vocabulary's whole space), so the
    uncapped full-clique verify stage grows quadratically with the
    corpus (candidate bound 5.97M pairs at sf10 → 50.7M at sf30, 21
    over-1k buckets holding 51% of it; even a 1000-cap's 24.8M
    bound overflowed it — cap 200 holds the bound at 9.45M,
    ~constant per-doc budget across the decade) and exhausted the host's ~70 GB of
    free shuffle disk before failing. The cap is the engine's documented
    template-corpus knob (lsh_candidate_pairs), now plumbed through
    near_dedup_minhash (r14); the graded sf0.01 query stays
    uncapped/lossless."""
    from pyspark.sql import functions as F

    from simple_etl_spark.llm.dedup import dedup_clusters, near_dedup_minhash

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # offset 10^8, NOT the graded layer's 10^6: sf30 has 1.5M docs, so
    # a +10^6 near-copy id COLLIDES with real doc ids (50k duplicate-id
    # rows — discovered r14 when the rewritten per-doc-array signature
    # kept duplicate ids as separate rows where the old explode+groupBy
    # shape silently merged them; the graded scales never reach 10^6
    # docs, so the graded lineage is collision-free everywhere the
    # driver runs it). The harness must measure the documented
    # unique-id contract, not the degenerate merge.
    near = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000000).alias("id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(near)
    pairs = near_dedup_minhash(
        corpus, "id", "text", threshold=0.5,
        max_bucket=max_bucket, cap_stats=cap_stats,
    )
    return dedup_clusters(pairs.select("id_a", "id_b"), corpus.select("id"))


def cell_clusters(out: str) -> None:
    from simple_etl_spark import queries as Q
    from simple_etl_spark.engine import ensure_runtime_confs, get_spark

    Q._load_all()
    spark = get_spark("sf30-clusters")
    max_bucket = 200
    results = {}
    for tag, parts, aqe in (("cfgA", "8", "true"), ("cfgB", "200", "false")):
        s2 = spark.newSession()
        ensure_runtime_confs(s2)
        s2.conf.set("spark.sql.shuffle.partitions", parts)
        s2.conf.set("spark.sql.adaptive.enabled", aqe)
        stats: dict = {}
        # the pipeline materializes EAGERLY inside the build (the
        # label-propagation loop localCheckpoints every round), so
        # the comparable number to SCALE_r8.json's build_s is the fn
        # wall time; the noop on the returned labels is trivial
        t0 = time.perf_counter()
        df = _clusters_capped(s2, max_bucket, stats)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(df)
        t1 = time.perf_counter() - t0
        h, n = agg_hash(df)
        audit = stats["stats"].first()
        results[tag] = (build_s + t1, h, n)
        _emit(out, {
            "cell": f"llm_dedup_clusters_sf30_{tag}",
            "partitions": parts, "aqe": aqe, "max_bucket": max_bucket,
            "build_s": round(build_s, 1), "noop_s": round(t1, 1),
            "rows": n,
            "capped_groups": audit["capped_groups"],
            "dropped_banded_rows": audit["dropped_rows"],
        })
    (ta, ha, na), (tb, hb, nb) = results["cfgA"], results["cfgB"]
    _emit(out, {
        "cell": "llm_dedup_clusters_sf30",
        "end_to_end_min_s": round(min(ta, tb), 1),
        "hash_identical": ha == hb and na == nb,
        "rows": na, "max_bucket": max_bucket,
        "note": "uncapped full-clique run exhausted the ~70 GB of "
                "free shuffle disk — recorded as the quadratic boundary; "
                "capped run is the production posture on a "
                "saturated-shingle corpus",
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
