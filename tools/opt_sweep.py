"""Round-14 optimization sweep: measure EVERY registered query.

Times each query in the registry at a given data dir (default sf0.1)
through the noop sink (full computation, no driver collect — guide
§1.4), after warm-up, min-of-N; captures the formatted physical plan
and counts the shape markers the optimization guide says to audit
(Exchange, join strategies, Python-boundary nodes, scans without
pushdown). Output: one JSON with per-query seconds + marker counts,
plus optional per-query plan files for plans/r14/.

Build-time cost is measured separately from execution: a query whose
constructor runs Spark jobs (collect of a skew profile, a sampled
threshold) pays that once per plan build, and that cost must be
visible, not folded into the steady-state number.

Usage:
  python tools/opt_sweep.py --out /tmp/opt_sweep.json \
      [--dir /root/testdata/sf0.1] [--reps 2] [--only q1,q2] \
      [--plans /root/repo/plans/r14 --plan-suffix before] [--skip-heavy]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
)

# Streaming drains and mutation queries are excluded from the timing
# sweep by default: they run checkpointed streams / rewrite snapshots,
# so "warm min-of-N" is not meaningful and they dominate the sweep's
# wall-clock. They are measured by their own harnesses.
STREAMING_PREFIX = "stream_"


def _plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _markers(plan: str) -> dict[str, int]:
    out = {}
    for m in MARKERS:
        n = len(re.findall(rf"\b{m}\b", plan))
        if n:
            out[m] = n
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--include-streaming", action="store_true")
    args = ap.parse_args()

    from simple_etl_spark.engine import get_spark, tune_for_input
    from simple_etl_spark import queries as q

    spark = get_spark("opt-sweep-r14")
    tune_for_input(spark, args.dir)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = list(q.queries())
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]
    if args.skip:
        drop = set(args.skip.split(","))
        names = [n for n in names if n not in drop]
    if not args.include_streaming:
        names = [n for n in names if not n.startswith(STREAMING_PREFIX)]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results: dict[str, dict] = {}
    fns = q.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_sweep: {name}")
        row: dict = {}
        try:
            t0 = time.perf_counter()
            df = fns[name](spark, args.dir)
            row["build_s"] = round(time.perf_counter() - t0, 3)
            plan = _plan_text(df)
            row["markers"] = _markers(plan)
            if args.plans:
                with open(
                    os.path.join(
                        args.plans, f"{name}_{args.plan_suffix}.txt"
                    ),
                    "w",
                ) as fh:
                    fh.write(plan)
            # warm-up (codegen, listing) then timed reps
            df.write.format("noop").mode("overwrite").save()
            best = 9e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row["exec_s"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            row["err"] = repr(exc)[:300]
        results[name] = row
        done = row.get("exec_s", row.get("err", "?"))
        print(f"{name}: {done}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    total = sum(r.get("exec_s", 0) for r in results.values())
    builds = sum(r.get("build_s", 0) for r in results.values())
    errs = [n for n, r in results.items() if "err" in r]
    print(
        f"swept {len(results)} queries: exec_total={total:.1f}s "
        f"build_total={builds:.1f}s errors={errs}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
