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
