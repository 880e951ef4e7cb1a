"""Detector for the lost-cache-handle bug class (r14).

Operators adopt() their internal persisted frames onto the frame they
return; a plan function that WRAPS that frame (orderBy/select/join) and
drops the original lets the weakref backstop unpersist the caches the
moment the wrapper is returned — the query then silently recomputes
every cached subtree (or, with checkpoints, fails loudly).

Signature: persisted RDDs present right after fn() returns that vanish
on gc.collect() while the returned frame is still alive. Legitimate
operator-internal early releases run DURING fn(), not at gc time.

Usage: python tools/find_lost_caches.py [sf_dir] [query ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from automated_datastore_discovery_with_aws_glue_spark.operators.cache import (
    persistent_rdd_ids,
    release,
)
from automated_datastore_discovery_with_aws_glue_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lostcache")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = sys.argv[2:] or list(qs)
    bad = []
    for name in names:
        fn = qs[name]
        gc.collect()
        before = persistent_rdd_ids(sc)
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"SKIP {name}: build failed: {type(exc).__name__}: {exc}"[:200])
            continue
        after_build = persistent_rdd_ids(sc) - before
        gc.collect()
        time.sleep(0.2)
        after_gc = persistent_rdd_ids(sc) - before
        lost = after_build - after_gc
        if lost:
            bad.append(name)
            print(f"LOST {name}: {len(lost)} cached RDD(s) released by GC "
                  f"while the result is alive (kept {len(after_gc)})")
        elif after_build:
            print(f"ok   {name}: {len(after_build)} cache(s), all owned")
        else:
            print(f"ok   {name}: no caches")
        release(df)
        del df
        gc.collect()
        spark.catalog.clearCache()
    print(f"\n{len(bad)} queries with lost cache handles: {bad}")


if __name__ == "__main__":
    main()
