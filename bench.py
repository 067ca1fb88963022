"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": batch_sec, "unit": "sec",
 "queries": {name: serial_sec, ...}, "sf": 0.1, ...}

Two measurements, both end-to-end through the noop sink (full
computation, no driver collect):

- ``queries`` — per-query serial latency (min of 2 after warm-up).
- ``value`` — wall-clock to complete the whole suite submitted
  concurrently (min of 2 rounds). This is the workload-level number:
  a single small query can't fill 32 cores (one-row-group scans cap
  intra-query scan parallelism at 1 task), but a cluster is never
  idle because it runs many queries at once — exactly what the
  concurrent submission measures. The serial total is also reported.

The session is sized to the input via ``tune_for_input`` (adaptive
execution off below 1 GiB of input — stage re-planning is pure
overhead when the whole dataset fits in a few partitions; on at-scale
inputs AQE stays on).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from simple_etl_spark.engine import get_spark, tune_for_input
    from simple_etl_spark.queries import bench_queries

    spark = get_spark("simple-etl-spark-bench")
    tune_for_input(spark, sf_dir)
    specs = bench_queries()

    # warm-up: JVM, codegen, file listing — not part of the measurement
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dfs = {name: spec.fn(spark, sf_dir) for name, spec in specs.items()}

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(df) -> float:
        t0 = time.perf_counter()
        noop(df)
        return time.perf_counter() - t0

    for df in dfs.values():  # unmeasured: codegen compile + file listing
        noop(df)

    serial = {name: round(min(timed(df), timed(df)), 3) for name, df in dfs.items()}

    batch = 9e9
    for _ in range(2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(len(dfs)) as ex:
            list(ex.map(noop, dfs.values()))
        batch = min(batch, time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": (
                    "headline suite wall-clock, all queries submitted "
                    "concurrently (workload throughput); per-query serial "
                    "latencies in 'queries'"
                ),
                "value": round(batch, 3),
                "unit": "sec",
                "queries": serial,
                "serial_total_sec": round(sum(serial.values()), 3),
                "concurrency": len(dfs),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
