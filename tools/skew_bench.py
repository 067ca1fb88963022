"""Adversarial-skew stress harness (VERDICT r11 #2).

SURVEY §4 names "full shuffle on a skewed key" as the canonical
scale-killer and operators/skew.py ships the salting primitives, but
until round 12 no measurement pitted them against a genuinely hostile
key distribution. This harness:

1. derives a skewed twin from the generated scale data
   (tools/gen_scaledata.py output): a fact table where ONE key owns
   ~40% of all rows (the megadomain / NULL-ish-default shape) and a
   keys dimension sized past any broadcast threshold's honesty at
   real scale (broadcast is force-disabled for the join cells — at
   100 TB the dimension would be 100M+ rows);
2. runs the grouped-agg heavyweights (algebraic rollup AND an exact
   distinct-count, the shape map-side combine can NOT fully absorb)
   and the fact⋈dim join, each plain vs salted, recording wall-clock
   and the distributed result digest (tools/digest.py) — salted and
   plain must hash identical;
3. probes that AQE's skew-join split actually FIRES on this corpus
   (``skew=true`` in the final adaptive SMJ plan) and measures AQE-on
   vs AQE-off wall-clock.

Amounts are decimal / integer so every digest comparison is exact —
no float-reorder tolerance needed.

Usage:
  python tools/skew_bench.py --base /tmp/scaledata/sf1 --tag sf1 \
      [--hot-permille 400] [--factor 32] [--out SKEW_r13.jsonl]

Env: SPARK_GRAFT_CPUS (local[N], default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digest import agg_hash  # noqa: E402

N_DIM_KEYS = 65536  # cold keys 1..N; key 0 is the hot one


def _session(cpus: int, mem: str = "8g"):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 64)))
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .appName("skew_bench_r12")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_skewed(spark, base: str, out_dir: str, hot_permille: int) -> str:
    """Derive the skewed fact + dim twin from base lineitem.

    key 0 owns hot_permille/1000 of rows (deterministic in
    l_orderkey, so re-runs rebuild the identical corpus); the rest
    spread uniformly over N_DIM_KEYS cold keys. Amounts are exact
    decimals; ``val`` is a high-cardinality payload for the
    distinct-count cell."""
    from pyspark.sql import functions as F

    fact_path = os.path.join(out_dir, "fact.parquet")
    dim_path = os.path.join(out_dir, "dim.parquet")
    if os.path.exists(fact_path) and os.path.exists(dim_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    li = spark.read.parquet(os.path.join(base, "lineitem.parquet"))
    fact = li.select(
        F.when(
            F.pmod(F.col("l_orderkey"), F.lit(1000)) < hot_permille, F.lit(0)
        )
        .otherwise(
            F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_DIM_KEYS))
            + 1
        )
        .cast("bigint")
        .alias("key"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("amount"),
        # high-cardinality payload: ~1 distinct value per 4 rows
        F.pmod(F.hash("l_orderkey", "l_partkey"), F.lit(1 << 22))
        .cast("bigint")
        .alias("val"),
    )
    fact.write.mode("overwrite").parquet(fact_path)
    dim = spark.range(0, N_DIM_KEYS + 1).select(
        F.col("id").alias("key"),
        F.pmod(F.col("id"), F.lit(16)).cast("bigint").alias("segment"),
    )
    dim.write.mode("overwrite").parquet(dim_path)
    return out_dir


def _timed(df, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/scaledata/sf1")
    ap.add_argument("--tag", default="sf1")
    ap.add_argument("--hot-permille", type=int, default=400)
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "SKEW_r13.jsonl"))
    ap.add_argument("--salt-all-pandas", action="store_true",
                    help="also time the whole-corpus-salted pandas "
                    "UDAF (measured 27x slower than plain at sf1)")
    ap.add_argument("--mem", default="8g",
                    help="spark.driver.memory (local mode: the one "
                    "JVM's heap). The sf30 holistic collect_set needs "
                    "more than the 8g default — its value-proportional "
                    "partial state OOMs the map side (SCALE.md §8e); "
                    "an at-scale deployment sizes executors to state "
                    "the same way")
    ap.add_argument("--only", default=None,
                    help="comma-separated cell subset to run (profile "
                    "always runs): agg_algebraic,agg_distinct,"
                    "agg_holistic_set,agg_holistic_pandas,join — for "
                    "resuming a run that died mid-cell without "
                    "re-measuring finished cells")
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    def _want(cell: str) -> bool:
        return want is None or cell in want

    from pyspark.sql import functions as F

    from simple_etl_spark.operators.skew import (
        salted_agg,
        salted_join,
        skew_profile,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus, args.mem)
    twin = build_skewed(
        spark,
        args.base,
        os.path.join("/tmp/scaledata", f"skew_{args.tag}"),
        args.hot_permille,
    )
    fact = spark.read.parquet(os.path.join(twin, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(twin, "dim.parquet"))
    recs: list[dict] = []

    def emit(rec: dict) -> None:
        rec = {"tag": args.tag, **rec}
        recs.append(rec)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    # -- 0. the diagnostic: how hot is the hot key ---------------------
    prof = skew_profile(fact, ["key"], top_n=3).collect()
    emit({
        "cell": "profile",
        "rows": fact.count(),
        "top": [
            {"key": r["key"], "cnt": r["cnt"],
             "share_permille": r["share_permille"],
             "skew_factor": r["skew_factor"]}
            for r in prof
        ],
    })
    # the intended salting workflow: skew_profile picks the keys worth
    # salting; everything else keeps one phase-1 group
    hot = [r["key"] for r in prof if r["skew_factor"] >= 100]

    # -- 1. grouped-agg heavyweight: algebraic rollup ------------------
    # Expectation worth recording either way: Spark's map-side partial
    # aggregation absorbs ALGEBRAIC skew (the hot reducer receives one
    # partial row per map task, not 40% of the corpus), so salting
    # should buy little here — the honest baseline for cell 2.
    plain_alg = fact.groupBy("key").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("amount").alias("sum_amount"),
        F.count(F.lit(1)).alias("n"),
    )
    salted_alg = salted_agg(
        fact,
        ["key"],
        [
            F.sum("qty").alias("p_qty"),
            F.sum("amount").alias("p_amount"),
            F.count(F.lit(1)).alias("p_n"),
        ],
        [
            F.sum("p_qty").alias("sum_qty"),
            F.sum("p_amount").alias("sum_amount"),
            F.sum("p_n").alias("n"),
        ],
        factor=args.factor,
    )
    if _want("agg_algebraic"):
        t_plain, t_salted = _timed(plain_alg), _timed(salted_alg)
        h_plain, n_plain = agg_hash(plain_alg)
        h_salted, _ = agg_hash(salted_alg)
        emit({
            "cell": "agg_algebraic", "plain_s": t_plain,
            "salted_s": t_salted,
            "rows": n_plain, "hash_identical": h_plain == h_salted,
        })

    # -- 2. grouped-agg heavyweight: exact distinct count --------------
    # countDistinct is the agg shape partial combine can NOT collapse
    # (every distinct (key,val) survives to the exchange). The salted
    # twin projects to (key,val) FIRST so the whole-row salt is a
    # function of val within each key — distinct vals partition cleanly
    # across salts and SUM of per-salt exact counts is exact.
    kv = fact.select("key", "val")
    plain_dist = kv.groupBy("key").agg(
        F.countDistinct("val").alias("n_vals")
    )
    salted_dist = salted_agg(
        kv,
        ["key"],
        [F.countDistinct("val").alias("p_vals")],
        [F.sum("p_vals").alias("n_vals")],
        factor=args.factor,
    )
    if _want("agg_distinct"):
        t_plain, t_salted = _timed(plain_dist), _timed(salted_dist)
        h_plain, n_plain = agg_hash(plain_dist)
        h_salted, _ = agg_hash(salted_dist)
        emit({
            "cell": "agg_distinct", "plain_s": t_plain,
            "salted_s": t_salted,
            "rows": n_plain, "hash_identical": h_plain == h_salted,
        })

    # -- 2b. grouped-agg heavyweight: HOLISTIC set aggregation ---------
    # The aggregate class salted_agg exists FOR (VERDICT r12 next-round
    # #1): collect_set's partial state is value-proportional, so the
    # hot key's reducer receives every map partition's partial set
    # (~hot-rows elements after per-partition dedup) and merges them
    # alone. The salted twin builds per-(key,salt) sets — the
    # whole-row salt on (key, val) is a function of val within a key,
    # so per-salt sets are DISJOINT and flatten(collect_list(...)) is
    # already the exact set. Output projects to (size, element-sum):
    # exact integers, no multi-million-element arrays in the digest.
    def _set_stats(df, set_col):
        return df.select(
            "key",
            F.size(set_col).alias("n_vals"),
            F.aggregate(
                set_col, F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("sum_vals"),
        )

    def _salted_set(hot_keys):
        return _set_stats(
            salted_agg(
                kv,
                ["key"],
                [F.collect_set("val").alias("p_vals")],
                [F.flatten(F.collect_list("p_vals")).alias("vals")],
                factor=args.factor,
                hot_keys=hot_keys,
            ),
            "vals",
        )

    if _want("agg_holistic_set"):
        plain_hset = _set_stats(
            kv.groupBy("key").agg(F.collect_set("val").alias("vals")),
            "vals",
        )
        salted_hset = _salted_set(None)
        hot_hset = _salted_set(hot)
        t_plain, t_salted = _timed(plain_hset), _timed(salted_hset)
        t_hot = _timed(hot_hset)
        h_plain, n_plain = agg_hash(plain_hset)
        h_salted, _ = agg_hash(salted_hset)
        h_hot, _ = agg_hash(hot_hset)
        emit({
            "cell": "agg_holistic_set", "plain_s": t_plain,
            "salted_all_s": t_salted, "salted_hot_s": t_hot,
            "rows": n_plain,
            "hash_identical": h_plain == h_salted == h_hot,
        })

    # -- 2c. grouped-agg heavyweight: grouped-agg pandas UDAF ----------
    # The OTHER holistic shape: a pandas aggregation must ship the
    # whole group's column through Arrow to ONE Python worker — the
    # hot key's 40% of the corpus serializes to a single process no
    # matter how many cores exist. Salting splits the hot group into
    # ``factor`` Arrow batches computed in parallel; the partials
    # (sum / count / max) recombine exactly.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def p_sum(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("bigint")
    def p_cnt(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("bigint")
    def p_max(v: pd.Series) -> int:
        return int(v.max())

    def _salted_pd(hot_keys):
        return salted_agg(
            kv,
            ["key"],
            [p_sum("val").alias("ps"), p_cnt("val").alias("pn"),
             p_max("val").alias("pm")],
            [F.sum("ps").alias("s"), F.sum("pn").alias("n"),
             F.max("pm").alias("m")],
            factor=args.factor,
            hot_keys=hot_keys,
        )

    plain_pd = kv.groupBy("key").agg(
        p_sum("val").alias("s"), p_cnt("val").alias("n"),
        p_max("val").alias("m"),
    )
    hot_pd = _salted_pd(hot)
    if not _want("agg_holistic_pandas"):
        rec = None
    else:
        t_plain, t_hot = _timed(plain_pd), _timed(hot_pd)
        h_plain, n_plain = agg_hash(plain_pd)
        h_hot, _ = agg_hash(hot_pd)
        rec = {
            "cell": "agg_holistic_pandas", "plain_s": t_plain,
            "salted_hot_s": t_hot, "rows": n_plain,
            "hash_identical": h_plain == h_hot,
        }
    if rec is not None and args.salt_all_pandas:
        # whole-corpus salting multiplies the Arrow group count by
        # ``factor`` — measured 20x SLOWER than plain at sf1 (99.2 s
        # vs 4.9 s), so it is opt-in here to keep the sf10 run
        # bounded; the boundary is recorded in SCALE.md SS9 either way
        t_all = _timed(_salted_pd(None))
        h_all, _ = agg_hash(_salted_pd(None))
        rec["salted_all_s"] = t_all
        rec["hash_identical"] = rec["hash_identical"] and h_plain == h_all
    if rec is not None:
        emit(rec)

    # -- 3. the join heavyweight ---------------------------------------
    # Broadcast force-disabled: at 100 TB the dimension is 100M+ rows
    # and the hot fact key MUST co-locate on one task under a plain
    # shuffle join — the scale-killer this harness exists to measure.
    rollup = lambda j: j.groupBy("segment").agg(  # noqa: E731
        F.sum("amount").alias("sum_amount"), F.count(F.lit(1)).alias("n")
    )
    if not _want("join"):
        ok = all(r.get("hash_identical", True) for r in recs)
        print(f"SUMMARY {args.tag}: {len(recs)} cells, "
              f"hash_identity={'OK' if ok else 'FAIL'}", flush=True)
        spark.stop()
        sys.exit(0 if ok else 1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plain_join = rollup(fact.join(dim, "key"))
        t_aqe_off = _timed(plain_join)
        h_join, n_join = agg_hash(plain_join)

        sj = rollup(salted_join(fact, dim, ["key"], factor=args.factor))
        t_salted = _timed(sj)
        h_sj, _ = agg_hash(sj)
        emit({
            "cell": "join_salted_vs_plain", "plain_aqe_off_s": t_aqe_off,
            "salted_aqe_off_s": t_salted, "rows": n_join,
            "hash_identical": h_join == h_sj,
        })

        # AQE skew-split probe: re-enable AQE, force the split to be
        # eligible at this scale, and assert skew=true in the FINAL
        # adaptive plan. The plan must be read from the SAME
        # DataFrame's queryExecution AFTER an action on it — a noop
        # write runs its own execution and leaves this one
        # isFinalPlan=false (first harness run read exactly that
        # un-executed twin and misreported the split as not firing).
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
        )
        aqe_join = rollup(fact.join(dim, "key"))
        t_aqe_on = _timed(aqe_join)
        aqe_join.collect()  # |segments| rows — finalizes THIS plan
        final_plan = (
            aqe_join._jdf.queryExecution().executedPlan().toString()
        )
        h_aqe, _ = agg_hash(aqe_join)
        emit({
            "cell": "join_aqe_probe", "plain_aqe_off_s": t_aqe_off,
            "aqe_on_s": t_aqe_on,
            "skew_split_fired": "skew=true" in final_plan
            and "skewed" in final_plan,
            "hash_identical": h_join == h_aqe,
        })
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    ok = all(
        r.get("hash_identical", True) for r in recs
    )
    print(f"SUMMARY {args.tag}: {len(recs)} cells, "
          f"hash_identity={'OK' if ok else 'FAIL'}", flush=True)
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
