from automated_datastore_discovery_with_aws_glue_spark.streaming.onboard import (
    EVENT_SCHEMA,
    onboard_stream,
    parse_events,
    windowed_event_counts,
)

__all__ = ["EVENT_SCHEMA", "onboard_stream", "parse_events", "windowed_event_counts"]
