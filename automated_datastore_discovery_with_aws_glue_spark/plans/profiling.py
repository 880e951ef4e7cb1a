"""Profiling / classification queries over the driver testdata.

``pii_classify_derived`` manufactures deterministic PII-shaped columns
from the events table (SSN/email/IP formats) and runs the real
classification operator over them — so the DuckDB oracle can verify the
detector math (same anchored regexes, same rounding) end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.operators.classify import classify_columns_long
from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

#: entities checked differentially (RE2-compatible patterns shared verbatim
#: with the oracle SQL)
ORACLE_ENTITIES = ("EMAIL", "IP_ADDRESS", "MAC_ADDRESS", "PHONE_NUMBER", "USA_SSN")


def derived_pii_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII-shaped columns derived from events."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.format_string("%03d-%02d-%04d", F.col("user_id"), F.col("event_id") % 100, F.col("event_id") % 10000).alias("ssn_like"),
        F.concat(F.lit("user"), F.col("user_id"), F.lit("@example.com")).alias("email_like"),
        F.format_string(
            "10.%d.%d.%d",
            F.col("user_id") % 256,
            F.col("event_id") % 256,
            (F.col("event_id") / F.lit(7)).cast("long") % 256,
        ).alias("ip_like"),
        F.col("event_type").alias("free_text"),
    )


def pii_classify_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify the derived frame; long-form fractions, fully ordered."""
    long_df = classify_columns_long(derived_pii_frame(spark, sf_dir), list(ORACLE_ENTITIES))
    return long_df.orderBy("columnName", "entity")


def pii_classify_oracle_sql() -> str:
    """DuckDB twin of :func:`pii_classify_derived`, generated from the
    same entity registry so regexes can never drift."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.entities import ENTITY_REGISTRY

    derived = """
        SELECT printf('%03d-%02d-%04d', user_id, event_id % 100, event_id % 10000) AS ssn_like,
               'user' || user_id || '@example.com' AS email_like,
               printf('10.%d.%d.%d', user_id % 256, event_id % 256, (event_id // 7) % 256) AS ip_like,
               event_type AS free_text
        FROM events
    """
    unions = []
    for col in ("email_like", "free_text", "ip_like", "ssn_like"):
        unions.append(f"SELECT '{col}' AS columnName, trim({col}) AS value FROM derived")
    stacked = " UNION ALL ".join(unions)
    entity_rows = []
    for name in ORACLE_ENTITIES:
        rx = ENTITY_REGISTRY[name].anchored.replace("'", "''")
        entity_rows.append(
            f"SELECT columnName, '{name}' AS entity, "
            f"round(avg(CASE WHEN regexp_matches(value, '{rx}') THEN 1.0 ELSE 0.0 END), 4) "
            f"AS match_fraction FROM stacked GROUP BY columnName"
        )
    body = " UNION ALL ".join(entity_rows)
    return (
        f"WITH derived AS ({derived}), stacked AS ({stacked}) "
        f"SELECT * FROM ({body}) ORDER BY columnName, entity"
    )
