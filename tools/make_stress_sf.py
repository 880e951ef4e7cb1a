"""Synthesize a larger scale factor from the driver testdata for the
robustness probe: replicate each fact table N times with key offsets
(dimension tables pass through), so the bench headline can run at
~sf1.0 on a box whose 128 GiB would hide sf0.1 memory cliffs.

Replication is deterministic and join-consistent:
- lineitem/orders: orderkeys offset per copy; custkey/partkey/suppkey
  stay in range, so every join/FK the queries use remains valid.
- events: event_id offset; user_id/ts untouched (watermark and session
  shapes keep their distribution, density grows N-fold).
- documents: doc_id offset and a copy-tag token appended — copies of a
  document are mutual NEAR-duplicates (high but non-1.0 Jaccard), which
  is exactly the C4-style duplicated-corpus shape the dedup operators
  must survive at scale.
- embeddings: vec_id offset and a deterministic per-copy directional
  perturbation (cosine-visible, tiny) so copies are near- but not
  exact-duplicate vectors.

Usage: python tools/make_stress_sf.py [src_sf_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_datastore_discovery_with_aws_glue_spark.session import get_spark
from automated_datastore_discovery_with_aws_glue_spark.sources.readers import TESTDATA_TABLES, load_table

DIMS = ("region", "nation", "customer", "supplier", "part")

_OFFSETS: dict[str, int] = {}


def _orderkey_offset(spark, src: str) -> int:
    """max(order key) + 1 across BOTH orders and lineitem — the single
    offset both tables' copies shift by, so every copied lineitem lands
    on its own copy's orders."""
    if src not in _OFFSETS:
        o = load_table(spark, src, "orders").agg(F.max("o_orderkey")).first()[0]
        l = load_table(spark, src, "lineitem").agg(F.max("l_orderkey")).first()[0]
        _OFFSETS[src] = max(int(o), int(l)) + 1
    return _OFFSETS[src]


def scale(spark, src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for table in TESTDATA_TABLES:
        df = load_table(spark, src, table)
        out = os.path.join(dst, f"{table}.parquet")
        if table in DIMS:
            df.write.mode("overwrite").parquet(out)
            continue
        copy = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_copy")
        rep = df.select("*", copy)
        if table == "lineitem":
            # ONE shared offset for lineitem AND orders: independent
            # per-table maxima keep the copies join-consistent only when
            # the two maxima happen to coincide (orders with no
            # lineitems could push max(o_orderkey) past max(l_orderkey))
            mx = _orderkey_offset(spark, src)
            rep = rep.withColumn("l_orderkey", F.col("l_orderkey") + F.col("_copy") * F.lit(mx))
        elif table == "orders":
            mx = _orderkey_offset(spark, src)
            rep = rep.withColumn("o_orderkey", F.col("o_orderkey") + F.col("_copy") * F.lit(mx))
        elif table == "events":
            mx = df.agg(F.max("event_id")).first()[0] + 1
            rep = rep.withColumn("event_id", F.col("event_id") + F.col("_copy") * F.lit(mx))
        elif table == "documents":
            mx = df.agg(F.max("doc_id")).first()[0] + 1
            rep = (
                rep.withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(mx))
                .withColumn(
                    "text",
                    F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" copytag"), F.col("_copy"))
                    ),
                )
            )
        elif table == "embeddings":
            mx = df.agg(F.max("vec_id")).first()[0] + 1
            pert = F.transform(
                "embedding",
                lambda x, j: x.cast("double")
                + F.col("_copy").cast("double") * 0.003 * ((j % 7).cast("double") - 3.0),
            )
            rep = rep.withColumn("vec_id", F.col("vec_id") + F.col("_copy") * F.lit(mx)).withColumn(
                "embedding", pert
            )
        rep.drop("_copy").repartition(32).write.mode("overwrite").parquet(out)
        print(f"{table}: x{copies}", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.stress/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("stress-gen")
    spark.sparkContext.setLogLevel("ERROR")
    scale(spark, src, dst, copies)


if __name__ == "__main__":
    main()
