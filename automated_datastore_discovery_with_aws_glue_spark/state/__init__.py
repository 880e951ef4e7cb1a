from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore

__all__ = ["ParquetStateStore", "merge_frames"]
