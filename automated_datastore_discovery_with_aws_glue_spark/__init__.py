"""PySpark-native datastore-discovery & profiling engine.

A brand-new engine with the query/data-processing capabilities of the
reference serverless framework (aws-samples/automated-datastore-discovery-
with-aws-glue): dataset discovery + registration, schema inference, a
metastore-backed catalog, per-column PII/entity classification, incremental
state tracking (tracker-table semantics as idempotent MERGE), reporting
queries, plus LLM-data-pipeline operators (dedup, similarity search, text
analysis) designed for 100 TB scale.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, broadcast joins for small dimensions, single-pass wide
aggregations for profiling, and Structured Streaming for event onboarding.
"""

from automated_datastore_discovery_with_aws_glue_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
