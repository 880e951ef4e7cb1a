"""Per-query profiler for optimization work (guide §1).

Times named queries() entries in isolation on the bench session:
- builds the DataFrame fresh each repetition (plan + execute),
- runs the action through the noop sink (computes every column of every
  row, no collect-to-driver cost) unless --collect is given to mimic
  bench.py's methodology exactly,
- optionally writes .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] [--collect]
        [--explain plans/r14 --suffix before] query [query ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from automated_datastore_discovery_with_aws_glue_spark.operators.cache import release
from automated_datastore_discovery_with_aws_glue_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--collect", action="store_true", help="time .collect() like bench.py")
    ap.add_argument("--explain", default=None, help="dir to write formatted plans into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--explain-only", action="store_true",
                    help="build + explain each query once, run no action")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up family as bench.py so first-rep numbers aren't codegen
    spark.range(1_000_000).selectExpr("sum(id)", "count(*)").collect()
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h").groupBy("h").count().collect()

    def write_plan(name: str, df) -> None:
        os.makedirs(args.explain, exist_ok=True)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())

    qs = entrymod.queries()
    if args.explain_only:
        for name in args.queries:
            df = qs[name](spark, args.sf)
            write_plan(name, df)
            release(df)
            print(f"{name}: plan written")
        return
    for name in args.queries:
        fn = qs[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}#{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.collect:
                rows = df.collect()
                n = len(rows)
            else:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            dt = time.perf_counter() - t0
            times.append(dt)
            if rep == 0 and args.explain:
                write_plan(name, df)
            release(df)
            spark.sparkContext.setJobDescription(None)
        msg = " ".join(f"{t:.2f}" for t in times)
        print(f"{name}: reps=[{msg}] min={min(times):.2f}" + (f" rows={n}" if args.collect else ""))


if __name__ == "__main__":
    main()
