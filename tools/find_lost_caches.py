"""Detector for the lost-cache-handle bug class (r14).

Operators adopt() their internal persisted frames onto the frame they
return; a plan function that WRAPS that frame (orderBy/select/join) and
drops the original lets the weakref backstop unpersist the caches the
moment the wrapper is returned — the query then silently recomputes
every cached subtree (or, with checkpoints, fails loudly).

Two signatures, both checked while the returned frame is still alive:

- MATERIALIZED loss: persisted RDDs present right after fn() returns
  that vanish on gc.collect(). Legitimate operator-internal early
  releases run DURING fn(), not at gc time.
- LAZY loss (the dsir case): a persist that never materialized during
  fn() leaves no RDD to watch — and the backstop release often fires
  DURING fn() itself (CPython refcounting frees the wrapped
  intermediate the moment ``return derived.orderBy(...)`` builds the
  wrapper), so timing-based detection misses it. Instead,
  ``DataFrame.persist`` is spied to record each persisted frame's
  analyzed-plan text plus a weakref; after build + gc, an entry whose
  DataFrame is DEAD but whose plan is still a SUBTREE of the returned
  frame's analyzed plan is a lost cache — the result references a
  deregistered cache and will silently recompute it. Owned caches keep
  their DataFrame alive through the adopt() handle (weakref alive);
  deliberate operator-internal releases (trainer bases) are not
  subtrees of the result plan. Neither false-positives.

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


def _strip_tree_prefix(line: str) -> str:
    """Drop the treeString nesting prefix (spaces, ':', '+', '-')."""
    return line.lstrip(" :+-")


def _is_subtree(sub_plan: str, parent_plan: str) -> bool:
    """True when ``sub_plan``'s lines appear as one contiguous block in
    ``parent_plan`` after stripping the nesting prefixes (a subtree
    embedded in a bigger tree keeps its lines verbatim but re-indented
    with ':'/'+-' rails, so raw substring matching never fires)."""
    sub = [_strip_tree_prefix(l) for l in sub_plan.splitlines() if l.strip()]
    par = [_strip_tree_prefix(l) for l in parent_plan.splitlines() if l.strip()]
    if not sub or len(sub) > len(par):
        return False
    for i in range(len(par) - len(sub) + 1):
        if par[i] == sub[0] and par[i : i + len(sub)] == sub:
            return True
    return False


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lostcache")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = sys.argv[2:] or list(qs)

    # spy on DataFrame.persist: record (weakref, analyzed-plan text) of
    # every frame an operator persists, so losses are detectable even
    # when the backstop release fires during fn() itself
    import weakref

    # patch the CONCRETE runtime class (Spark 4's classic DataFrame
    # overrides persist; patching the pyspark.sql.DataFrame base is a
    # no-op for live frames)
    _DF = type(spark.range(1))

    persists: list[tuple] = []
    _orig_persist = _DF.persist

    def _spy_persist(self, *a, **k):
        out = _orig_persist(self, *a, **k)
        try:
            persists.append(
                (weakref.ref(self), self._jdf.queryExecution().analyzed().toString())
            )
        except Exception:
            pass
        return out

    _DF.persist = _spy_persist
    bad = []
    for name in names:
        fn = qs[name]
        gc.collect()
        before = persistent_rdd_ids(sc)
        n_persists = len(persists)
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
        try:
            result_plan = df._jdf.queryExecution().analyzed().toString()
        except Exception:
            result_plan = ""
        lazy_lost = sum(
            1
            for ref, plan in persists[n_persists:]
            if ref() is None and plan and _is_subtree(plan, result_plan)
        )
        n_owned = sum(1 for ref, _ in persists[n_persists:] if ref() is not None)
        if lost or lazy_lost:
            bad.append(name)
            print(
                f"LOST {name}: {len(lost)} materialized + {lazy_lost} lazy "
                f"cache(s) released by GC while the result is alive "
                f"(kept {len(after_gc)} rdd / {n_owned} owned handles)"
            )
        elif after_build or n_owned:
            print(f"ok   {name}: {n_owned} owned handle(s), "
                  f"{len(after_build)} materialized")
        else:
            print(f"ok   {name}: no caches")
        release(df)
        del df
        gc.collect()
        spark.catalog.clearCache()
    _DF.persist = _orig_persist
    print(f"\n{len(bad)} queries with lost cache handles: {bad}")


if __name__ == "__main__":
    main()
