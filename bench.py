"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": 0.1}

Queries are forced end-to-end with the noop sink (full computation,
no driver collect) — measuring the plan, not the row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from simple_etl_spark.engine import get_spark
    from simple_etl_spark.queries import bench_queries

    spark = get_spark("simple-etl-spark-bench")
    specs = bench_queries()

    # warm-up: JVM, codegen, file listing — not part of the measurement
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(spec) -> float:
        df = spec.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        run(spec)  # unmeasured warm-up: codegen compile + file listing
        timings[name] = round(min(run(spec), run(spec)), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
