from automated_datastore_discovery_with_aws_glue_spark.catalog.engine import DiscoveryEngine

__all__ = ["DiscoveryEngine"]
