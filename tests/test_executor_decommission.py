"""Graceful executor decommission (SIGPWR) — the scale-down path a
spot/preemptible 1000-executor fleet exercises constantly, distinct
from the SIGKILL crash path tests/test_executor_loss.py pins.

With ``spark.decommission.enabled`` the executor JVM registers a
handler for SIGPWR: on signal it stops accepting new tasks, finishes
running ones, and (with ``spark.storage.decommission.shuffleBlocks``)
MIGRATES its shuffle map outputs to a peer before exiting. The
observable contract this test pins, under ``local-cluster[2,2,1024]``
with real executor JVMs:

* mid-query grace (leg A): SIGPWR during the reduce's first wave —
  the query completes with the identical result, no task failures
  surface, and the victim pid eventually leaves the executor set;
* shuffle-block migration (leg B, the airtight discriminator): a
  fresh query materializes its shuffle (map tasks drop one marker
  file per (partition, execution) into a shared tmp dir), THEN the
  victim is decommissioned while idle and the test WAITS for its pid
  to exit before re-collecting the same Dataset. The re-collect's
  reduce must fetch the dead executor's map outputs — if migration
  carried them to the peer, the skipped map stage stays skipped
  (marker count unchanged); if the blocks had died with the JVM, the
  FetchFailed path would re-run map partitions and mint extra
  markers (the SIGKILL contrast in tests/test_executor_loss.py). The
  victim being provably gone BEFORE the reduce starts removes the
  serves-fetches-while-draining loophole a mid-query marker check
  would have.
  ``spark.executor.decommission.forceKillTimeout`` backstops a
  lingering drain (observed at sf1 — see SCALE.md §8b); a force-kill
  before migration completed would surface as lost blocks and fail
  the marker assertion, so the backstop cannot mask a migration
  failure.

Subprocess isolation: one JVM hosts one SparkContext; the suite's
shared session is local[*].
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import glob, os, signal, subprocess, sys, tempfile, threading
    import time, uuid
    sys.path.insert(0, %(repo)r)
    sys.path.insert(0, %(tests)r)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
             .config("spark.ui.enabled", "false")
             .config("spark.task.maxFailures", "4")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.decommission.enabled", "true")
             .config("spark.storage.decommission.enabled", "true")
             .config("spark.storage.decommission.shuffleBlocks.enabled",
                     "true")
             .config("spark.storage.decommission.rddBlocks.enabled", "true")
             .config("spark.executor.decommission.forceKillTimeout", "45s")
             .appName("executor_decommission").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from simple_etl_spark.engine import ship_package
    ship_package(spark)

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

    def await_two():
        t0 = time.time()
        while time.time() - t0 < 90:
            pids = exec_pids()
            if len(pids) == 2:
                return pids
            time.sleep(0.5)
        raise AssertionError(f"cluster never at 2 executors: {pids}")

    marker_dir = tempfile.mkdtemp()

    def mark_and_pass(batches):
        # one marker per (partition, execution): reruns of the map
        # stage are directly countable
        open(os.path.join(%(mdir)s, uuid.uuid4().hex), "w").close()
        for b in batches:
            yield b

    def slow(batches):
        import time as _t
        for b in batches:
            _t.sleep(1.0)
            yield b

    def build_ds():
        df = (spark.range(0, 2000, 1, 16)
              .select((F.col("id") %% 97).alias("k"),
                      (F.col("id") * 31 %% 1009).alias("v")))
        marked = df.mapInPandas(mark_and_pass, "k bigint, v bigint")
        agg = marked.groupBy("k").agg(F.sum("v").alias("s"),
                                      F.count("*").alias("c"))
        # same stage as the shuffle read (no extra exchange): slows the
        # 8 reduce tasks into two waves on 2x2 cores
        return agg.mapInPandas(slow, "k bigint, s bigint, c bigint")

    def rows_of(ds):
        return sorted((r["k"], r["s"], r["c"]) for r in ds.collect())

    def markers():
        return len(glob.glob(os.path.join(%(mdir)s, "*")))

    def await_exit(victim, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if victim not in exec_pids():
                return True
            time.sleep(0.5)
        return False

    # clean run: 16 map partitions -> exactly 16 markers
    expected = rows_of(build_ds())
    assert len(expected) == 97
    clean_markers = markers()
    assert clean_markers == 16, f"expected 16 map markers, {clean_markers}"

    ST = spark.sparkContext.statusTracker()

    def signal_when_reduce_active(before):
        t0 = time.time()
        while time.time() - t0 < 90:
            for sid in ST.getActiveStageIds():
                info = ST.getStageInfo(sid)
                if info and info.numTasks == 8 and info.numActiveTasks > 0:
                    time.sleep(0.3)  # reduce wave 1 genuinely mid-flight
                    victim = sorted(before)[0]
                    os.kill(victim, signal.SIGPWR)
                    return victim
            time.sleep(0.05)
        raise AssertionError("reduce stage never became active")

    # --- leg A: mid-query grace ---------------------------------------
    before = await_two()
    result = {}
    def run():
        try:
            result["rows"] = rows_of(build_ds())
        except Exception as exc:
            result["exc"] = repr(exc)
    t = threading.Thread(target=run)
    t.start()
    victim = signal_when_reduce_active(before)
    t.join(300)
    assert not t.is_alive(), "query hung after decommission"
    assert "exc" not in result, result["exc"]
    assert result["rows"] == expected, "decommission changed the result"
    print("DECOM_RESULT_OK", flush=True)

    # the victim must actually leave (graceful exit; the 45 s
    # forceKillTimeout backstops a lingering drain)
    assert await_exit(victim), f"executor {victim} never exited"
    print("DECOM_EXIT_OK", flush=True)

    # --- leg B: migration with the victim provably gone ---------------
    # materialize the shuffle, decommission an executor while IDLE,
    # wait for its JVM to exit, then re-collect the SAME Dataset: the
    # reduce re-runs but the map stage's outputs must come from the
    # migrated copies (marker count frozen). If the blocks had died
    # with the JVM, FetchFailed would re-run map partitions and mint
    # extra markers. A force-kill before migration completed would
    # ALSO surface as extra markers, so the backstop cannot mask a
    # migration failure.
    before_b = await_two()
    ds = build_ds()
    expected_b = rows_of(ds)
    m_after_first = markers()
    victim_b = sorted(before_b)[0]
    os.kill(victim_b, signal.SIGPWR)
    assert await_exit(victim_b), f"executor {victim_b} never exited (leg B)"
    got_b = rows_of(ds)
    assert got_b == expected_b, "post-exit re-collect changed the result"
    assert markers() == m_after_first, (
        f"map stage re-executed after decommission exit: "
        f"{markers() - m_after_first} extra markers (0 = migrated)")
    print("DECOM_MIGRATION_OK", flush=True)

    # the scaled-down-then-relaunched cluster must still grade clean
    import __spark_entry__ as e
    from oracle_harness import compare, duck_connection
    qs, osql = e.queries(), e.oracle_sql()
    sf = "/root/testdata/sf0.001"
    con = duck_connection(sf)
    ok, msg = compare(qs["pricing_summary"](spark, sf), con,
                      osql["pricing_summary"])
    assert ok, f"post-decommission oracle mismatch: {msg}"
    print("POST_DECOM_ORACLE_OK", flush=True)
    spark.stop()
    """
)


def test_decommission_migrates_and_recovers_identically():
    script = _SCRIPT % {
        "repo": REPO,
        "tests": os.path.join(REPO, "tests"),
        "mdir": "marker_dir",
    }
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    for marker in ("DECOM_RESULT_OK", "DECOM_EXIT_OK",
                   "DECOM_MIGRATION_OK", "POST_DECOM_ORACLE_OK"):
        assert marker in proc.stdout, (
            marker, proc.stdout[-2000:], proc.stderr[-3000:],
        )
