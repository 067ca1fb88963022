"""Round-9 multi-JVM validation (VERDICT r8 #1): replay the grading
window and the dual-config determinism sweep under
``local-cluster[2,16,4096]`` — two REAL executor JVMs with serialized
inter-executor shuffles, the one leg of the 100x-scale posture every
prior round executed inside a single JVM.

Phases (each incremental + resumable via the JSONL output):

1. ``window``  — the driver's first-50 grading window vs the DuckDB
   oracle at sf0.01, exactly the preflight loop, but cross-JVM.
2. ``sweep``   — every registered query executed under two opposed
   configs (8 shuffle partitions + AQE on vs 200 partitions + AQE
   off); canonical row-set hashes must be identical. A query whose
   result changes with partitioning under a REAL exchange fabric is a
   determinism defect no single-JVM sweep can see. Above ~100 MB of
   input the hash switches to the distributed order-independent
   digest (tools/digest.py) so sf1+ sweeps never collect a relation
   to the driver (round 12; override SPARK_GRAFT_CLUSTER_HASH).

Usage: ``python tools/cluster_validate.py [window|sweep|all]``
Writes JSONL to $SPARK_GRAFT_CLUSTER_OUT (one record per unit,
skip-on-resume) and a summary to stdout at the end.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

OUT = os.environ.get(
    "SPARK_GRAFT_CLUSTER_OUT", os.path.join(REPO, "CLUSTER_r11.jsonl")
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
MASTER = os.environ.get("SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,16,4096]")


def _done() -> set[tuple[str, str]]:
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    done.add((rec["phase"], rec["name"]))
                except (ValueError, KeyError):
                    continue
    return done


def _emit(rec: dict) -> None:
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
        fh.flush()


def _session():
    import re

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(MASTER)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("cluster_validate_r9")
    )
    # local-cluster[n,cores,mem]'s third field is the WORKER pool, not
    # the executor heap — executors default to 1 GB regardless (the
    # SCALE.md §8c lesson, already applied in tools/fault_inject.py).
    # Without this the sf1 sweep's heaviest cell (the recursive
    # clustering's checkpointed self-joins) dies with executor OOM →
    # RejectedExecutionException retry storms (observed r13).
    m = re.match(r"local-cluster\[\d+\s*,\s*\d+\s*,\s*(\d+)\]", MASTER)
    if m:
        builder = builder.config("spark.executor.memory",
                                 f"{m.group(1)}m")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# Above this summed parquet input size the sweep's cfgA-vs-cfgB hash
# switches from collect+canonicalize to the DISTRIBUTED digest
# (tools/digest.py): sf0.1 twins are ~17 MB, sf1 ~173 MB, sf10 ~1.9 GB
# — the collect path is retired above sf0.1 so an sf10 relation never
# lands on the 6 GB driver. Both configs of a sweep cell use the same
# mode, which is all the identity check needs. Override with
# SPARK_GRAFT_CLUSTER_HASH={collect,agg}.
_AGG_CUTOVER_BYTES = 100 << 20


def _input_bytes(sf_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    continue
    return total


def _hash_mode() -> str:
    env = os.environ.get("SPARK_GRAFT_CLUSTER_HASH")
    if env in ("collect", "agg"):
        return env
    return "agg" if _input_bytes(SF_DIR) > _AGG_CUTOVER_BYTES else "collect"


def _canonical_hash(df, mode: str = "collect") -> tuple[str, int]:
    if mode == "agg":
        from digest import agg_hash

        return agg_hash(df)
    from oracle_harness import canonicalize

    rows = df.collect()
    cols = df.columns
    canon = canonicalize(cols, rows)
    payload = repr(sorted(cols)) + "\n" + "\n".join(repr(r) for r in canon)
    return hashlib.md5(payload.encode()).hexdigest(), len(rows)


def run_window(spark, done: set) -> None:
    import __spark_entry__ as e
    from oracle_harness import compare, duck_connection

    qs, osql = e.queries(), e.oracle_sql()
    window = list(qs)[:50]
    con = duck_connection(SF_DIR)
    for name in window:
        if ("window", name) in done:
            continue
        t0 = time.time()
        try:
            if name in osql:
                ok, msg = compare(qs[name](spark, SF_DIR), con, osql[name])
            else:
                n = qs[name](spark, SF_DIR).count()
                ok, msg = n >= 0, f"rows-only ({n} rows)"
        except Exception as exc:  # noqa: BLE001 — recorded, not raised
            ok, msg = False, f"EXC {type(exc).__name__}: {exc}"[:300]
        _emit({"phase": "window", "name": name, "ok": bool(ok),
               "msg": str(msg)[:200], "sec": round(time.time() - t0, 2)})
        print(f"window {name}: {'ok' if ok else 'FAIL ' + str(msg)[:120]}",
              flush=True)


def run_sweep(spark, done: set) -> None:
    import __spark_entry__ as e

    qs = e.queries()
    mode = _hash_mode()
    print(f"sweep hash mode: {mode}", flush=True)
    configs = [
        ("cfgA", {"spark.sql.shuffle.partitions": "8",
                  "spark.sql.adaptive.enabled": "true"}),
        ("cfgB", {"spark.sql.shuffle.partitions": "200",
                  "spark.sql.adaptive.enabled": "false"}),
    ]
    for name in qs:
        if ("sweep", name) in done:
            continue
        t0 = time.time()
        rec = {"phase": "sweep", "name": name}
        try:
            hashes = {}
            for tag, conf in configs:
                for k, v in conf.items():
                    spark.conf.set(k, v)
                h, n = _canonical_hash(qs[name](spark, SF_DIR), mode)
                hashes[tag] = h
                rec[f"rows_{tag}"] = n
            rec["ok"] = hashes["cfgA"] == hashes["cfgB"]
            rec["hash"] = hashes["cfgA"]
            if not rec["ok"]:
                rec["hash_b"] = hashes["cfgB"]
        except Exception as exc:  # noqa: BLE001
            rec["ok"] = False
            rec["msg"] = f"EXC {type(exc).__name__}: {exc}"[:300]
        finally:
            for k, v in {"spark.sql.shuffle.partitions": "8",
                         "spark.sql.adaptive.enabled": "true"}.items():
                spark.conf.set(k, v)
        rec["sec"] = round(time.time() - t0, 2)
        _emit(rec)
        print(f"sweep {name}: {'ok' if rec['ok'] else 'MISMATCH/ERR'}",
              flush=True)


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    done = _done()
    spark = _session()
    print(f"master={MASTER} sf={SF_DIR} resume={len(done)} records",
          flush=True)
    if what in ("window", "all"):
        run_window(spark, done)
    if what in ("sweep", "all"):
        run_sweep(spark, done)
    # summary — tolerant of a partial line from a killed _emit, same
    # as _done(): the resume path already skipped it, so the summary
    # must not crash on it after hours of re-executed work
    if not os.path.exists(OUT):
        print("SUMMARY: no records emitted (unknown phase?)", flush=True)
        spark.stop()
        return
    recs = []
    for line in open(OUT):
        try:
            recs.append(json.loads(line))
        except ValueError:
            continue
    for phase in ("window", "sweep"):
        sub = [r for r in recs if r["phase"] == phase]
        ok = sum(1 for r in sub if r["ok"])
        print(f"SUMMARY {phase}: {ok}/{len(sub)} ok", flush=True)
        for r in sub:
            if not r["ok"]:
                print("  FAIL", r["name"], r.get("msg", r.get("hash_b", "")),
                      flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
