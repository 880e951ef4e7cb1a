"""Streaming onboarding (SURVEY §2.9, §3.1).

The reference's event path — CloudTrail -> EventBridge rule -> trigger
Lambda -> SQS -> tracking Lambda -> DynamoDB conditional insert
(`lambda/s3-trigger/app.py:179-242`, `lambda/glue-tracking-initial/
app.py:140-237`) — collapses into ONE Structured Streaming pipeline:

    readStream(json) -> validate (P7) -> tag gate (P10) -> foreachBatch
        -> MERGE INTO tracker (WHEN NOT MATCHED INSERT)

Semantics carried over:
- at-least-once delivery + consumer dedup  -> checkpointing plus
  idempotent MERGE on the deterministic natural-key id (replays no-op)
- event validation filter                  -> declarative filter on
  (source, detail.eventName)
- gdpr-scan tag gate                       -> filter on the tag map
- fan-out routing to two queues            -> two filtered branches of
  one source (route_events)

Beyond reference parity (it has no windows/watermarks — README.md:362
defers late-data handling), ``windowed_event_counts`` declares the
engine's tumbling-window + watermark surface, testable on the driver's
``events`` table via the batch-equivalent ``f10_time_bucket`` query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from automated_datastore_discovery_with_aws_glue_spark.catalog.engine import DiscoveryEngine

#: CloudTrail-ish envelope (`lambda/s3-trigger/app.py:86-111`, FIXTURES.md §events)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField(
            "detail",
            T.StructType(
                [
                    T.StructField("eventName", T.StringType()),
                    T.StructField(
                        "requestParameters", T.MapType(T.StringType(), T.StringType())
                    ),
                ]
            ),
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

#: (source, eventName) pairs that create trackable sources (P7 filters:
#: `lambda/s3-trigger/app.py:86-111` and dynamodb/rds analogues)
VALID_EVENTS = {
    ("aws.s3", "CreateBucket"): "s3",
    ("aws.dynamodb", "CreateTable"): "dynamodb",
    ("aws.rds", "CreateDBCluster"): "rds",
}


def parse_events(raw: DataFrame) -> DataFrame:
    """Validate + normalize an event stream: P7 source/eventName filter,
    P10 gdpr-scan gate, natural-key id derivation (all declarative)."""
    pairs = F.array(
        *[
            F.struct(F.lit(s).alias("s"), F.lit(e).alias("e"))
            for (s, e) in VALID_EVENTS
        ]
    )
    type_map = F.create_map(
        *[
            x
            for (s, e), st in VALID_EVENTS.items()
            for x in (F.lit(s), F.lit(st))
        ]
    )
    return (
        raw.filter(
            F.array_contains(
                pairs,
                F.struct(
                    F.col("source").alias("s"), F.col("detail.eventName").alias("e")
                ),
            )
        )
        .filter(F.col("tags").getItem("gdpr-scan") == "true")
        .select(
            F.sha2(
                F.to_json(F.struct("source", "detail.requestParameters")), 256
            ).substr(1, 32).alias("id"),
            type_map[F.col("source")].alias("data_source_type"),
            F.lit(False).alias("glue_job_created"),
            F.lit(False).alias("data_catalog_entry"),
            F.col("detail.requestParameters").alias("data_source_attrs"),
            F.lit(None).cast("string").alias("data_catalog_table_name"),
            F.lit(None).cast("string").alias("data_catalog_db_name"),
            F.col("tags"),
        )
    )


def route_events(raw: DataFrame) -> dict[str, DataFrame]:
    """Two-way fan-out of one validated stream (ref: one event to two
    queues, `lambda/s3-trigger/app.py:217-239`): custom-entity-tagged
    sources go to a second branch."""
    parsed = parse_events(raw)
    custom = parsed.filter(F.col("tags").getItem("glue-custom-entity") == "true")
    standard = parsed.filter(
        (F.col("tags").getItem("glue-custom-entity") != "true")
        | F.col("tags").getItem("glue-custom-entity").isNull()
    )
    return {"standard": standard, "custom_entity": custom}


def onboard_stream(
    spark: SparkSession,
    engine: DiscoveryEngine,
    events_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Run the onboarding stream over a JSON event directory.

    ``foreachBatch`` MERGEs each micro-batch into the tracker with
    WHEN-NOT-MATCHED-INSERT only — exactly-once effect even under
    at-least-once replay (id is the natural key). ``Trigger.AvailableNow``
    drains the backlog and stops (the scheduled-batch formulation); flip
    to continuous by passing available_now=False.
    """
    raw = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)
    parsed = parse_events(raw)

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            engine.onboard_batch(batch.dropDuplicates(["id"]))

    writer = (
        parsed.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts with a late-data watermark — works on both
    a stream (stateful, late rows dropped past the watermark) and a batch
    frame (degenerates to a group-by; cf. the oracle-checked
    f10_time_bucket query)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )
