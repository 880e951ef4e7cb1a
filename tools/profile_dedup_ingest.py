"""Job-level timeline of the incr_dedup_ingest lifecycle (guide §1).

Runs the same lifecycle as the bench query — a fresh CorpusDedupIndex
bulk-loads 90% of documents, ingests the 10% delta, then reads
kept_ids — on a session with the EVENT LOG enabled, and prints every
Spark job's duration and description parsed from the log. This is the
honest "how many sequential jobs does the delta phase run, and what
does each cost" instrument the control-plane fusion work needs.

Usage: python tools/profile_dedup_ingest.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.session import get_spark
from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    evdir = tempfile.mkdtemp(prefix="prof_dedup_evlog_")
    spark = get_spark(
        "profile-dedup",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)", "count(*)").collect()

    from automated_datastore_discovery_with_aws_glue_spark.plans.incremental import (
        CorpusDedupIndex,
    )

    sc = spark.sparkContext

    for rep in range(args.reps):
        docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
        root = tempfile.mkdtemp(prefix="prof_dedup_idx_")
        try:
            t0 = time.perf_counter()
            idx = CorpusDedupIndex(spark, root, threshold=0.5, max_bucket=200)
            marks = [("init", time.perf_counter() - t0)]
            t0 = time.perf_counter()
            sc.setJobDescription(f"rep{rep}:bulk")
            idx.ingest(docs.filter(F.col("doc_id") % 10 < 9))
            marks.append(("bulk_ingest", time.perf_counter() - t0))
            t0 = time.perf_counter()
            sc.setJobDescription(f"rep{rep}:delta")
            idx.ingest(docs.filter(F.col("doc_id") % 10 >= 9))
            marks.append(("delta_ingest", time.perf_counter() - t0))
            t0 = time.perf_counter()
            sc.setJobDescription(f"rep{rep}:kept")
            out = idx.kept_ids().orderBy("id").localCheckpoint()
            n = out.count()
            marks.append(("kept_ids", time.perf_counter() - t0))
            sc.setJobDescription(None)
            print(f"rep {rep}: rows={n} " + " ".join(f"{k}={v:.2f}s" for k, v in marks))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # flush and parse the event log: per-job (duration, description).
    # Spark 4 writes a rolling directory eventlog_v2_<appId>/events_*.
    app_id = sc.applicationId
    spark.stop()
    paths: list[str] = []
    for name in sorted(os.listdir(evdir)):
        p = os.path.join(evdir, name)
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.startswith("events")
            )
        elif name.startswith(app_id):
            paths.append(p)
    starts: dict[int, tuple[float, str]] = {}
    rows = []
    for path in paths:
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                if ev.get("Event") == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                    starts[ev["Job ID"]] = (ev["Submission Time"], desc)
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        sub, desc = starts[jid]
                        rows.append((jid, (ev["Completion Time"] - sub) / 1000.0, desc))
    print("\n-- per-job timeline (jobId, seconds, description) --")
    for jid, dur, desc in rows:
        print(f"job {jid:4d}  {dur:7.3f}s  {desc}")
    by_desc: dict[str, tuple[int, float]] = {}
    for _jid, dur, desc in rows:
        n, t = by_desc.get(desc, (0, 0.0))
        by_desc[desc] = (n + 1, t + dur)
    print("\n-- per-phase job totals --")
    for desc, (n, t) in sorted(by_desc.items()):
        print(f"{desc or '(none)':24s}  jobs={n:3d}  total={t:7.3f}s")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
