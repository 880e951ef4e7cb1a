"""Streaming exact dedup — the stream twin of ``operators.dedup``'s
exact path, for ingest-time cleaning of a document feed.

``dropDuplicatesWithinWatermark`` keeps per-key state only until the
event-time watermark passes the key's first sighting plus the delay, so
state is bounded by the dedup horizon instead of growing with the corpus
(plain ``dropDuplicates`` on a stream retains every key forever). The
dedup key is the text fingerprint (md5 of the normalized text,
``operators.text.fingerprint``) — the same key the batch ``dedup_exact``
groups on, so backfill and live ingest agree on what counts as a dup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from automated_datastore_discovery_with_aws_glue_spark.operators.text import fingerprint


def stream_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    dedup_horizon: str = "10 minutes",
) -> DataFrame:
    """Emit only the first sighting of each distinct (normalized) text
    within the dedup horizon. A duplicate arriving after the horizon is
    treated as new — the price of bounded state; widen the horizon to
    trade state size for dedup reach."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, dedup_horizon)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def stream_segment_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    sep: str = "\n\n",
    dedup_horizon: str = "10 minutes",
) -> DataFrame:
    """Ingest-time C4-style segment dedup — the stream twin of
    ``operators.dedup.dedup_segments``: split each arriving document on
    ``sep`` and keep only the globally FIRST sighting of every distinct
    segment within the event-time horizon (cross-batch state bounded by
    the watermark, exactly like :func:`stream_exact_dedup`).

    Emits SEGMENT rows ``(doc_id, ts, pos, seg, n_total)``; compose with
    :func:`reassemble_segments` inside ``foreachBatch`` to get documents
    back (all of a document's segments surface in the same micro-batch,
    so batch-side reassembly is exact). A per-document SENTINEL row
    (``pos = -1``, namespaced unique fingerprint) always survives the
    dedup, so a document whose every segment is boilerplate still comes
    back — empty — rather than vanishing, matching the batch operator's
    contract. ``n_total`` (the document's pre-dedup segment count) rides
    every row so reassembly can report drops without a second stateful
    operator."""
    import re as _re

    segs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        F.split(F.col(text_col), F.lit(_re.escape(sep)), -1).alias("_parts"),
    ).select(
        "doc_id",
        "ts",
        F.size(F.filter("_parts", lambda s: F.trim(s) != "")).alias("n_total"),
        F.posexplode(
            F.concat(F.array(F.lit("")), F.col("_parts"))  # slot 0 = sentinel
        ).alias("pos", "seg"),
    )
    segs = (
        segs.filter((F.col("pos") == 0) | (F.trim("seg") != ""))
        .withColumn("pos", F.col("pos") - 1)
        .withColumn(
            "fp",
            # namespace prefixes ('s' segment / 'd' doc-sentinel) make a
            # segment-vs-sentinel fingerprint collision structurally
            # impossible, whatever the segment text says
            F.when(
                F.col("pos") >= 0,
                F.md5(F.concat(F.lit("s"), F.col("seg")).cast("binary")),
            ).otherwise(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("d"), F.col("doc_id"), F.col("ts")
                    ).cast("binary")
                )
            ),
        )
        .withWatermark("ts", dedup_horizon)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    return segs


def reassemble_segments(
    segs: DataFrame, *, sep: str = "\n\n"
) -> DataFrame:
    """Batch-side reassembly for ``foreachBatch`` over
    :func:`stream_segment_dedup` output: surviving segments regroup into
    ``(doc_id, text, n_kept, n_dropped)`` ordered by original position.
    The sentinel (``pos = -1``) guarantees one output row per ingested
    document; ``n_dropped`` = pre-dedup segment count minus survivors."""
    return (
        segs.groupBy("doc_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("pos") >= 0, F.struct("pos", "seg"))
                        )
                    ),
                    lambda s: s.getField("seg"),
                ),
            ).alias("text"),
            F.sum((F.col("pos") >= 0).cast("long")).alias("n_kept"),
            (F.max("n_total") - F.sum((F.col("pos") >= 0).cast("long"))).alias(
                "n_dropped"
            ),
        )
    )
