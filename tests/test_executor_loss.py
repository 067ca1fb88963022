"""Executor-loss fault injection (VERDICT r9 prescription 1): a
1000-executor cluster loses executors routinely, so task retry /
stage resubmission must reproduce the identical result when an
executor JVM dies mid-query — batch AND streaming.

Under ``local-cluster[2,2,1024]`` each executor is a REAL separate
JVM (a ``java … CoarseGrainedExecutorBackend`` process) the test can
SIGKILL. Three kill points are exercised in one subprocess (one
cluster spin-up, ~2 min):

* **map-stage kill** — tasks die mid-flight, TaskScheduler retries
  them on the surviving executor (``spark.task.maxFailures``).
* **reduce-stage kill** — the dead executor's shuffle map outputs are
  lost, so surviving reduce tasks hit FetchFailed and the DAGScheduler
  must RESUBMIT the parent map stage — the recovery path a plain task
  retry never touches.
* **streaming micro-batch kill** — an availableNow drain loses an
  executor mid-batch; the micro-batch's task retry must still commit
  exactly the batch-equivalent result to the sink.

After the kills, a graded window query is replayed on the same
(now executor-recycled) session against the DuckDB oracle — the
cluster that lost executors must still grade clean.

Assertions prove a REAL loss happened (the killed pid was a live
executor JVM; the post-kill executor set contains a NEW pid from the
worker relaunch) and that every result is hash-identical to its
pre-kill clean run. Subprocess isolation because one JVM hosts one
SparkContext and the suite's shared session is local[*].
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import os, signal, subprocess, sys, tempfile, threading, time
    sys.path.insert(0, %(repo)r)
    sys.path.insert(0, %(tests)r)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
             .config("spark.ui.enabled", "false")
             .config("spark.task.maxFailures", "4")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.adaptive.enabled", "false")
             .appName("executor_loss").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from simple_etl_spark.engine import ship_package
    ship_package(spark)

    # scope the pid scan to THIS app: another local-cluster on the
    # host (a concurrent scale replay) contributes its own executor
    # JVMs, and an unscoped scan waits forever for "exactly 2" or
    # kills a bystander
    app_id = spark.sparkContext.applicationId

    def exec_pids():
        out = subprocess.run(["ps", "-eo", "pid,comm,args"],
                             capture_output=True, text=True).stdout
        pids = []
        for line in out.splitlines():
            parts = line.split(None, 2)
            if (len(parts) == 3 and parts[1] == "java"
                    and "CoarseGrainedExecutorBackend" in parts[2]
                    and app_id in parts[2]):
                pids.append(int(parts[0]))
        return set(pids)

    def slow(batches):
        import time as _t
        for b in batches:
            _t.sleep(0.4)
            yield b

    ST = spark.sparkContext.statusTracker()

    def kill_when(stage_pred, before):
        t0 = time.time()
        while time.time() - t0 < 90:
            for sid in ST.getActiveStageIds():
                info = ST.getStageInfo(sid)
                if info and info.numActiveTasks > 0 and stage_pred(info):
                    time.sleep(0.5)  # tasks genuinely mid-flight
                    victim = sorted(before)[0]
                    os.kill(victim, signal.SIGKILL)
                    return victim
            time.sleep(0.05)
        raise AssertionError("kill point never reached")

    def await_two_executors():
        t0 = time.time()
        while time.time() - t0 < 60:
            pids = exec_pids()
            if len(pids) == 2:
                return pids
            time.sleep(0.5)
        raise AssertionError(f"cluster never back at 2 executors: {pids}")

    def await_relaunch(before):
        # poll, don't sleep a fixed 3 s: under load the standalone
        # worker can take longer to respawn the executor
        t0 = time.time()
        while time.time() - t0 < 60:
            after = exec_pids()
            if after - before:
                return after
            time.sleep(0.5)
        raise AssertionError(
            f"no relaunched executor after 60 s: was the kill real? "
            f"before={before}"
        )

    def faulted_run(build_rows, stage_pred):
        before = await_two_executors()
        result = {}
        def run():
            try:
                result["rows"] = build_rows()
            except Exception as exc:
                result["exc"] = repr(exc)
        t = threading.Thread(target=run)
        t.start()
        victim = kill_when(stage_pred, before)
        t.join(240)
        assert not t.is_alive(), "query hung after executor kill"
        assert "exc" not in result, result["exc"]
        after = await_relaunch(before)
        assert victim in before and victim not in after, (victim, after)
        return result["rows"]

    # --- batch legs -------------------------------------------------
    # map = 16 tasks (slow), reduce = 4 tasks (slow): task counts
    # distinguish the stages deterministically (AQE off). The Dataset
    # chain is REBUILT per run — a reused Dataset re-serves the prior
    # run's shuffle files and the map stage never executes again,
    # which would leave nothing to kill (observed live).
    def build():
        df = (spark.range(0, 2000, 1, 16)
              .select((F.col("id") %% 97).alias("k"),
                      (F.col("id") * 31 %% 1009).alias("v")))
        slowed = df.mapInPandas(slow, "k bigint, v bigint")
        agg = (slowed.groupBy("k")
               .applyInPandas(lambda p: (time.sleep(0.2), p.assign(
                   s=p["v"].sum(), c=len(p)).head(1))[1][["k", "s", "c"]],
                   "k bigint, s bigint, c bigint"))
        return sorted((r["k"], r["s"], r["c"]) for r in agg.collect())

    expected = build()
    assert len(expected) == 97

    got_map = faulted_run(build, lambda i: i.numTasks == 16)
    assert got_map == expected, "map-stage kill changed the result"
    print("MAP_KILL_OK", flush=True)

    got_reduce = faulted_run(build, lambda i: i.numTasks == 4)
    assert got_reduce == expected, "reduce-stage kill changed the result"
    print("REDUCE_KILL_OK", flush=True)

    # --- streaming leg ----------------------------------------------
    with tempfile.TemporaryDirectory() as td:
        src, ckpt = os.path.join(td, "src"), os.path.join(td, "ckpt")
        base = (spark.range(0, 1200, 1, 12)
                .select((F.col("id") %% 13).alias("k"),
                        (F.col("id") * 7 %% 101).alias("v")))
        base.write.parquet(src)
        want = sorted((r["k"], r["s"]) for r in
                      base.groupBy("k").agg(F.sum("v").alias("s")).collect())
        stream = (spark.readStream.schema("k bigint, v bigint").parquet(src)
                  .mapInPandas(slow, "k bigint, v bigint")
                  .groupBy("k").agg(F.sum("v").alias("s")))
        before = await_two_executors()
        q = (stream.writeStream.outputMode("complete")
             .format("memory").queryName("faulted")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        victim = kill_when(lambda i: True, before)
        assert q.awaitTermination(240), "drain hung after executor kill"
        after = await_relaunch(before)
        assert victim not in after, (victim, after)
        got = sorted((r["k"], r["s"]) for r in
                     spark.sql("SELECT * FROM faulted").collect())
        assert got == want, "streaming kill changed the sink contents"
    print("STREAM_KILL_OK", flush=True)

    # --- the cluster that lost executors must still grade clean -----
    import __spark_entry__ as e
    from oracle_harness import compare, duck_connection
    qs, osql = e.queries(), e.oracle_sql()
    sf = "/root/testdata/sf0.001"
    con = duck_connection(sf)
    ok, msg = compare(qs["pricing_summary"](spark, sf), con,
                      osql["pricing_summary"])
    assert ok, f"post-kill oracle mismatch: {msg}"
    print("POST_KILL_ORACLE_OK", flush=True)
    spark.stop()
    """
) % {"repo": REPO, "tests": os.path.join(REPO, "tests")}


def test_executor_loss_recovers_identically():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    for marker in ("MAP_KILL_OK", "REDUCE_KILL_OK", "STREAM_KILL_OK",
                   "POST_KILL_ORACLE_OK"):
        assert marker in proc.stdout, (
            marker, proc.stdout[-2000:], proc.stderr[-3000:],
        )
