from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
    ALL_ENTITY_NAMES,
    ENTITY_REGISTRY,
    EntitySpec,
)
from automated_datastore_discovery_with_aws_glue_spark.functions.sanitize import sanitize_identifier

__all__ = ["ALL_ENTITY_NAMES", "ENTITY_REGISTRY", "EntitySpec", "sanitize_identifier"]
