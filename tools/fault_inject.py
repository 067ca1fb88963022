"""Executor-loss fault injection at scale (round 10, VERDICT r9 #1;
round 11 added the graceful-decommission phase): kill a REAL executor
JVM mid-query under ``local-cluster`` and verify task retry / stage
resubmission / streaming state recovery reproduce the IDENTICAL
canonical result hash the healthy cluster produced. The
``decommission`` phase sends SIGPWR instead: the executor migrates
its shuffle blocks and exits cleanly (the spot-reclaim path), and the
result must still hash-match.

tests/test_executor_loss.py pins the mechanism on a toy relation; this
harness proves it on the engine's own heavyweights at generated-twin
scale (tools/gen_scaledata.py twins in /tmp/scaledata): banded dedup
self-joins whose shuffles actually span executors, and the stateful
gap-session drain killed mid-micro-batch.

Each (query × kill_point) row records the clean hash, the faulted
hash, the killed pid, and whether the worker relaunched a replacement.
Kill points: ``early`` (0.5 s after the first active task) and
``late`` (~60% of the clean wall-clock). Records append to the OUT file
incrementally; re-runs resume by skipping recorded rows.

Usage::

    python tools/fault_inject.py [batch|stream|decommission|all]

Env: SPARK_GRAFT_SF_DIR (default /tmp/scaledata/sf1),
SPARK_GRAFT_CLUSTER_MASTER (default local-cluster[2,8,3072]).
Records append to FAULT_r11.jsonl (override SPARK_GRAFT_FAULT_OUT).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

OUT = os.environ.get(
    "SPARK_GRAFT_FAULT_OUT", os.path.join(REPO, "FAULT_r11.jsonl")
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf1")
MASTER = os.environ.get(
    "SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,8,3072]"
)

BATCH_QUERIES = [
    "llm_dedup_clusters",      # minhash->LSH->verify->label propagation
    "llm_simhash_hamming",     # banded Hamming self-join
    "llm_prefix_dups",         # band + hash-ladder verify join
    "llm_cap_audit",           # the new audit aggregates
    "revenue_by_segment",      # broadcast-join rollup (headline shape)
]
STREAM_QUERIES = ["stream_gap_sessions", "stream_running_totals"]
# graceful-decommission phase (round 11): SIGPWR instead of SIGKILL —
# the executor migrates shuffle blocks and exits cleanly, so the
# result must be identical WITHOUT the FetchFailed recompute path
# (mechanism pinned at toy scale by tests/test_executor_decommission.py)
DECOM_QUERIES = [
    "llm_dedup_clusters",
    "llm_simhash_hamming",
    "revenue_by_segment",
    "stream_gap_sessions",
]


def _done() -> set[tuple[str, str, str]]:
    """Completed (name, kill_point, sf) keys. sf is part of the key —
    the sf10 re-runs of the too-fast-at-sf1 rows would otherwise be
    skipped as 'done' — and ok=None (finished-before-kill) rows do
    NOT count: they are non-results a re-run at a bigger sf exists to
    replace (code-review r10)."""
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    if rec.get("ok") is not None:
                        done.add((rec["name"], rec["kill_point"],
                                  rec.get("sf", "")))
                except (ValueError, KeyError):
                    continue
    return done


def _emit(rec: dict) -> None:
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
        fh.flush()


APP_ID = None  # set once the session exists


def exec_pids() -> set[int]:
    """Executor JVM pids OF THIS APPLICATION — the args filter on the
    Spark app id matters: another local-cluster on the same host (the
    r10 window replay ran concurrently) contributes its own
    CoarseGrainedExecutorBackend processes, and an unscoped scan
    either waits forever for 'exactly 2 executors' or kills a
    bystander (observed live)."""
    out = subprocess.run(
        ["ps", "-eo", "pid,comm,args"], capture_output=True, text=True
    ).stdout
    pids = set()
    for line in out.splitlines():
        parts = line.split(None, 2)
        if (
            len(parts) == 3
            and parts[1] == "java"
            and "CoarseGrainedExecutorBackend" in parts[2]
            and (APP_ID is None or APP_ID in parts[2])
        ):
            pids.add(int(parts[0]))
    return pids


def expected_executors() -> int:
    """Executor count the configured master will launch.

    Derived from the ``local-cluster[N,cores,mem]`` master string so a
    non-default SPARK_GRAFT_CLUSTER_MASTER doesn't strand
    ``await_executors`` on a hardcoded 2 (ADVICE r10); overridable via
    SPARK_GRAFT_EXECUTORS for masters whose worker count isn't
    encoded in the URL (standalone/YARN)."""
    env = os.environ.get("SPARK_GRAFT_EXECUTORS")
    if env:
        return int(env)
    m = re.match(r"local-cluster\[(\d+)\s*,", MASTER)
    if m:
        return int(m.group(1))
    return 2


def await_executors(n: int, timeout: float = 120) -> set[int]:
    t0 = time.time()
    pids: set[int] = set()
    while time.time() - t0 < timeout:
        pids = exec_pids()
        if len(pids) == n:
            return pids
        time.sleep(0.5)
    raise AssertionError(f"cluster never at {n} executors: {pids}")


def _session():
    from pyspark.sql import SparkSession

    # local-cluster[n,cores,mem]'s third field is the WORKER's
    # capacity, NOT the executor heap: executors default to
    # spark.executor.memory = 1g regardless of the master string
    # (discovered r11 — every earlier "per-slot memory" cell ran 1 GB
    # heaps and only the concurrency varied). Set the executor heap
    # to the worker capacity so the master string means what it says.
    exec_mem = None
    m = re.match(r"local-cluster\[\d+\s*,\s*\d+\s*,\s*(\d+)\]", MASTER)
    if m:
        exec_mem = f"{m.group(1)}m"

    builder = (
        SparkSession.builder.master(MASTER)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.task.maxFailures", "4")
        # width is a scale knob: 16 fits the sf1 twins; the sf10
        # retries need 64+ or the banded self-join partitions outgrow
        # a 768 MB-per-slot heap (observed java.lang.OutOfMemoryError)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_FAULT_PARTITIONS", "16"),
        )
        # decommission knobs are inert for the SIGKILL legs (SIGKILL
        # cannot be caught) and enable the SIGPWR phase's graceful
        # path with shuffle-block migration
        .config("spark.decommission.enabled", "true")
        .config("spark.storage.decommission.enabled", "true")
        .config("spark.storage.decommission.shuffleBlocks.enabled", "true")
        .config("spark.storage.decommission.rddBlocks.enabled", "true")
        # without this a decommissioned executor can linger forever in
        # the drained state (observed at sf1: the victim survived the
        # cell, got re-picked by the next one, and re-signaling a
        # decommissioned executor is a no-op) — a real fleet's cluster
        # manager reclaims the host; the timeout plays that role here
        .config("spark.executor.decommission.forceKillTimeout", "45s")
        .appName("fault_inject_r11")
    )
    if exec_mem is not None:
        builder = builder.config("spark.executor.memory", exec_mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from simple_etl_spark.engine import ship_package

    ship_package(spark)
    global APP_ID
    APP_ID = spark.sparkContext.applicationId
    return spark


def _canonical_hash(df) -> tuple[str, int]:
    """Clean-vs-faulted comparison hash. Default: collect + the
    oracle harness's canonicalization (exact, but the driver must
    hold the result — fine through sf1). SPARK_GRAFT_FAULT_HASH=agg
    switches to a DISTRIBUTED order-independent digest (per-row md5
    over null-tagged stringified columns, reduced by count + sum +
    xor on the executors), so a ~10M-row sf10 relation never lands on
    the driver; both runs of a cell use the same mode, which is all
    the clean-vs-faulted identity check needs."""
    if os.environ.get("SPARK_GRAFT_FAULT_HASH") == "agg":
        return _agg_hash(df)
    from oracle_harness import canonicalize

    rows = df.collect()
    cols = df.columns
    canon = canonicalize(cols, rows)
    payload = repr(sorted(cols)) + "\n" + "\n".join(repr(r) for r in canon)
    return hashlib.md5(payload.encode()).hexdigest(), len(rows)


def _agg_hash(df) -> tuple[str, int]:
    # shared with tools/cluster_validate.py — see tools/digest.py for
    # the null-sentinel and float-rounding rationale (ADVICE r11)
    from digest import agg_hash

    return agg_hash(df)


def _faulted_hash(spark, fn, kill_delay: float,
                  sig: int = signal.SIGKILL) -> dict:
    """Run ``fn`` in a thread; 0.5 s after the first active task plus
    ``kill_delay``, send ``sig`` (SIGKILL = crash, SIGPWR = graceful
    decommission) to the lowest-pid executor; return the result hash
    plus kill forensics."""
    before = await_executors(expected_executors())
    result: dict = {}

    def run():
        try:
            result["hash"], result["rows"] = _canonical_hash(fn())
        except Exception as exc:  # noqa: BLE001 — recorded by caller
            result["exc"] = f"{type(exc).__name__}: {exc}"[:300]

    t = threading.Thread(target=run)
    t.start()
    st = spark.sparkContext.statusTracker()
    t0 = time.time()
    victim = None
    while time.time() - t0 < 600 and t.is_alive():
        active = [
            st.getStageInfo(sid)
            for sid in st.getActiveStageIds()
        ]
        if any(i and i.numActiveTasks > 0 for i in active):
            time.sleep(0.5 + kill_delay)
            if t.is_alive():  # don't kill after the query finished
                # re-intersect with LIVE pids: a late kill_delay spans
                # minutes, the snapshot victim can die on its own (sf10
                # OOM observed), and an unguarded os.kill would either
                # crash the matrix or, with pid reuse, hit a bystander
                live = exec_pids() & before
                if live:
                    victim = sorted(live)[0]
                    try:
                        os.kill(victim, sig)
                    except ProcessLookupError:
                        victim = None
            break
        time.sleep(0.05)
    t.join(900)
    if t.is_alive():
        result["exc"] = "query hung after kill"
        # the hung collect's job would keep occupying both executors
        # and poison every later (query x kill_point) cell on this
        # shared session — cancel it before moving on
        spark.sparkContext.cancelAllJobs()
    # poll for the worker respawn rather than snapshotting once: a
    # query that finishes right after the kill joins before the
    # standalone worker relaunches, and a single snapshot would
    # misreport relaunched=false (code-review r10 — the sibling
    # pytest's await_relaunch, applied here too)
    after = exec_pids()
    if victim is not None:
        t0 = time.time()
        while time.time() - t0 < 60 and not (after - before):
            time.sleep(0.5)
            after = exec_pids()
    result["kill_pid"] = victim
    result["killed"] = victim is not None and victim not in after
    result["relaunched"] = bool(after - before)
    return result


def run_phase(spark, names: list[str], done: set,
              sig: int = signal.SIGKILL, tag: str = "") -> None:
    import __spark_entry__ as e

    qs = e.queries()
    for name in names:
        if all((name, tag + p, SF_DIR) in done for p in ("early", "late")):
            continue  # don't pay two at-scale clean runs to skip both
        fn = lambda n=name: qs[n](spark, SF_DIR)  # noqa: E731
        try:
            cold_hash, _ = _canonical_hash(fn())
            # warm re-run: the faulted runs below are warm too, so the
            # 'late' kill delay must come from warm wall-clock (a cold
            # first run reads 2-5x its steady state and the late kill
            # would always land after completion)
            t0 = time.time()
            clean_hash, clean_rows = _canonical_hash(fn())
            clean_sec = time.time() - t0
            if cold_hash != clean_hash:
                _emit({"name": name, "kill_point": tag + "clean",
                       "sf": SF_DIR, "ok": False,
                       "msg": "cold/warm clean hashes differ — "
                              "nondeterministic query, cannot fault-test"})
                continue
        except Exception as exc:  # noqa: BLE001
            # tag-prefixed like the kill points: the same query can
            # appear in the batch AND decommission phases, and a bare
            # "clean" row could not be attributed (code-review r11)
            _emit({"name": name, "kill_point": tag + "clean",
                   "sf": SF_DIR, "ok": False,
                   "msg": f"clean run failed: {exc}"[:300]})
            continue
        print(f"{name}: clean {clean_sec:.1f}s rows={clean_rows} "
              f"hash={clean_hash[:12]}", flush=True)
        for point, delay in ((tag + "early", 0.0),
                             (tag + "late", clean_sec * 0.6)):
            if (name, point, SF_DIR) in done:
                continue
            t0 = time.time()
            res = _faulted_hash(spark, fn, delay, sig)
            if res.get("kill_pid") is None and "exc" not in res:
                # the query beat the kill to the finish line — that is
                # a non-result, not a pass or a failure
                _emit({"name": name, "kill_point": point, "sf": SF_DIR,
                       "ok": None,
                       "msg": "finished before kill point (too fast)",
                       "sec": round(time.time() - t0, 1)})
                print(f"{name} × {point}: skipped (too fast)", flush=True)
                continue
            ok = (
                res.get("hash") == clean_hash
                and res.get("killed", False)
            )
            rec = {
                "name": name, "kill_point": point, "sf": SF_DIR,
                "ok": bool(ok),
                "clean_hash": clean_hash, "fault_hash": res.get("hash"),
                "rows": res.get("rows"), "clean_rows": clean_rows,
                "kill_pid": res.get("kill_pid"),
                "killed": res.get("killed"),
                "relaunched": res.get("relaunched"),
                "sec": round(time.time() - t0, 1),
                "clean_sec": round(clean_sec, 1),
            }
            if "exc" in res:
                rec["msg"] = res["exc"]
            _emit(rec)
            print(f"{name} × {point}: "
                  f"{'ok' if ok else 'FAIL ' + str(rec.get('msg', 'hash/kill mismatch'))}",
                  flush=True)


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    only = {
        n for n in os.environ.get("SPARK_GRAFT_FAULT_ONLY", "").split(",")
        if n
    }

    def pick(names):
        return [n for n in names if not only or n in only]

    done = _done()
    spark = _session()
    print(f"master={MASTER} sf={SF_DIR} resume={len(done)} records",
          flush=True)
    if what in ("batch", "all"):
        run_phase(spark, pick(BATCH_QUERIES), done)
    if what in ("stream", "all"):
        run_phase(spark, pick(STREAM_QUERIES), done)
    if what in ("decommission", "all"):
        run_phase(spark, pick(DECOM_QUERIES), done,
                  sig=signal.SIGPWR, tag="decom_")
    recs = []
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                recs.append(json.loads(line))
            except ValueError:
                continue
    ok = sum(1 for r in recs if r.get("ok"))
    skipped = sum(1 for r in recs if r.get("ok") is None)
    print(f"SUMMARY (all sf in {os.path.basename(OUT)}): "
          f"{ok}/{len(recs)} ok ({skipped} skipped-too-fast)",
          flush=True)
    for r in recs:
        if r.get("ok") is False:
            print("  FAIL", r["name"], r["kill_point"],
                  r.get("msg", ""), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
