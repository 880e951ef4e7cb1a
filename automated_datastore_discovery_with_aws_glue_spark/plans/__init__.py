from automated_datastore_discovery_with_aws_glue_spark.plans import relational

__all__ = ["relational"]
