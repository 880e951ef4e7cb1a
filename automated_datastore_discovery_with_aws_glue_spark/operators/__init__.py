from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
    classify_columns,
    classify_columns_long,
)

__all__ = ["classify_columns", "classify_columns_long"]
