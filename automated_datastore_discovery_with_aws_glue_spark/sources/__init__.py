from automated_datastore_discovery_with_aws_glue_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    register_testdata_views,
)

__all__ = ["TESTDATA_TABLES", "load_table", "register_testdata_views"]
