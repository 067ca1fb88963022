"""Round-9 spill-not-OOM demonstration (VERDICT r8 #2): run the
heavyweight operators at sf10 under deliberately TIGHT executor
memory and record completion + spill bytes.

The 100 TB posture asserts every stateful path spills rather than
OOMs (SCALE.md §5); this measures it. Each (query, heap cap) runs in
a FRESH subprocess so an OOM kills only that cell, and spill metrics
come from the driver's own status store (REST API on the local UI)
summed over all completed stages.

Usage: ``python tools/spill_bench.py [sf_dir]`` — one JSONL record
per cell to SPILL_r9.jsonl (skip-on-resume).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SPILL_r9.jsonl")

QUERIES = [
    "llm_minhash_lsh",
    "llm_dedup_clusters",
    "llm_simhash_hamming",
    "llm_winnowing_dups",
    "llm_text_quality",
    "llm_prefix_dups",
]
# (heap, task threads): per-SLOT execution memory is the real knob —
# 4g/32 threads ~ 70 MB of unified execution memory per slot (tight),
# 2g/8 threads ~ 140 MB (tighter still per byte of heap, but sane:
# Spark sizing guidance is >= a few hundred MB per core; the sweep's
# one OOM was 2g/32 = ~35 MB/slot, BELOW any supported sizing — kept
# in the JSONL as the measured misconfiguration boundary).
CAPS = [("4g", "32"), ("2g", "8")]

CELL = textwrap.dedent(
    """
    import json, sys, time, urllib.request
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[" + {threads!r} + "]")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4059")
             .config("spark.driver.memory", {cap!r})
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    t0 = time.time()
    n = e.queries()[{name!r}](spark, {sf!r}).count()
    sec = round(time.time() - t0, 1)
    app = spark.sparkContext.applicationId
    # uiWebUrl, not the configured port: Spark port-retries to 4060+
    # if 4059 is busy, and a wrong-port fetch would record an
    # hour-long completed cell as FAILED
    base = spark.sparkContext.uiWebUrl
    url = f"{{base}}/api/v1/applications/{{app}}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=30).read())
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    peak = max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
    print("CELLRESULT " + json.dumps({{
        "rows": n, "sec": sec, "memoryBytesSpilled": mem_spill,
        "diskBytesSpilled": disk_spill, "peakExecutionMemory": peak,
        "stages": len(stages)}}), flush=True)
    """
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf10"
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
                done.add((r["query"], r["cap"], str(r.get("threads", 32))))
            except (ValueError, KeyError):
                continue
    for name in QUERIES:
        for cap, threads in CAPS:
            if (name, cap, threads) in done:
                continue
            script = CELL.format(repo=REPO, cap=cap, name=name, sf=sf, threads=threads)
            rec = {"query": name, "cap": cap, "threads": int(threads), "sf": sf}
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", script],
                    capture_output=True, text=True, timeout=3600, cwd=REPO,
                )
            except subprocess.TimeoutExpired:
                # a thrashing cell must be RECORDED, not abort the
                # sweep (and not re-wedge it on resume)
                rec.update(completed=False, error="timeout after 3600s",
                           oom=False)
                with open(OUT, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")
                print(f"{name} @ {cap}: TIMEOUT", flush=True)
                continue
            out = [l for l in proc.stdout.splitlines() if "CELLRESULT" in l]
            if proc.returncode == 0 and out:
                rec.update(json.loads(out[-1].split("CELLRESULT ", 1)[1]))
                rec["completed"] = True
            else:
                rec["completed"] = False
                tail = (proc.stderr or proc.stdout)[-1500:]
                rec["error"] = tail
                rec["oom"] = ("OutOfMemory" in tail or "Killed" in tail
                              or proc.returncode in (-9, 137))
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(f"{name} @ {cap}: "
                  + ("ok %ss spill=%s" % (rec.get("sec"),
                                          rec.get("diskBytesSpilled"))
                     if rec["completed"] else "FAILED"),
                  flush=True)


if __name__ == "__main__":
    main()
