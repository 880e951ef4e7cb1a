"""Entity registry invariants."""

from __future__ import annotations

import re

import pytest

from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
    ALL_ENTITY_NAMES,
    ENTITY_REGISTRY,
    resolve_entities,
)

# full capability surface of the reference's EntityDetector
# (scripts/glue/s3-source/s3-source-script.py:24-281)
REFERENCE_ENTITY_COUNT = 256


def test_registry_covers_reference_surface():
    assert len(ALL_ENTITY_NAMES) == REFERENCE_ENTITY_COUNT


def test_all_patterns_compile_and_are_re2_safe():
    for spec in ENTITY_REGISTRY.values():
        rx = re.compile(spec.anchored)
        assert rx is not None
        # RE2 compatibility: no lookarounds / backreferences
        assert "(?=" not in spec.pattern
        assert "(?!" not in spec.pattern
        assert "(?<" not in spec.pattern
        assert not re.search(r"\\[0-9]", spec.pattern)


@pytest.mark.parametrize(
    ("entity", "positive", "negative"),
    [
        ("EMAIL", "a.user+tag@sub.example.co.uk", "not-an-email"),
        ("CREDIT_CARD", "4111-1111-1111-1111", "12ab"),
        ("IP_ADDRESS", "192.168.0.255", "999.999.1.1"),
        ("MAC_ADDRESS", "00:1B:44:11:3A:B7", "001B44113AB7"),
        ("USA_SSN", "123-45-6789", "12-345-6789"),
        ("UK_BANK_SORT_CODE", "75-37-90", "7537-90"),
        ("UK_NATIONAL_INSURANCE_NUMBER", "AB123456C", "DQ123456C"),
        ("UK_UNIQUE_TAXPAYER_REFERENCE_NUMBER", "9246159175", "12345"),
        ("PHONE_NUMBER", "+44 20 7946 0321", "12"),
        ("JAPAN_PASSPORT_NUMBER", "TK1234567", "123"),
        ("ITALY_FISCAL_CODE", "RSSMRA85T10A562S", "XXXX"),
        ("SPAIN_DNI", "12345678-Z", "1234"),
        ("INDIA_AADHAAR_NUMBER", "2345 6789 0123", "1234 5678 9012"),
        ("CHINA_IDENTIFICATION", "11010519491231002X", "123"),
        ("NETHERLANDS_VALUE_ADDED_TAX", "NL123456789B01", "NL123"),
    ],
)
def test_detector_formats(entity, positive, negative):
    rx = re.compile(ENTITY_REGISTRY[entity].anchored)
    # fullmatch ONLY: anchored is ^(?:...)$, so a prefix-match fallback
    # could never add coverage — and would hide a truncated-format
    # regression if the anchoring were ever loosened
    assert rx.fullmatch(positive.strip()), entity
    assert rx.fullmatch(negative) is None


def test_resolve_unknown_raises():
    with pytest.raises(KeyError):
        resolve_entities(["NOT_AN_ENTITY"])


def test_register_custom_entity_full_path(spark):
    """A runtime-registered custom entity classifies like a built-in
    (the reference's glue-custom-entity route) and cleans up."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
        register_custom_entity,
        unregister_custom_entity,
    )
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
        classify_columns,
    )

    register_custom_entity(
        "ACME_ORDER_ID", r"ACME-[0-9]{6}", context=("order",)
    )
    try:
        df = spark.createDataFrame(
            [(f"ACME-{100000 + i}", f"note {i}") for i in range(20)],
            ["order_ref", "note"],
        )
        got = {
            r["columnName"]: r["entityTypes"]
            for r in classify_columns(df, ["ACME_ORDER_ID", "EMAIL"]).collect()
        }
        assert got == {"order_ref": ["ACME_ORDER_ID"]}
    finally:
        unregister_custom_entity("ACME_ORDER_ID")
    with pytest.raises(KeyError):
        resolve_entities(["ACME_ORDER_ID"])


def test_register_custom_entity_validation(spark):
    from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
        register_custom_entity,
        unregister_custom_entity,
    )

    with pytest.raises(ValueError, match="already registered"):
        register_custom_entity("EMAIL", r"x")
    with pytest.raises(ValueError, match="invalid Java regex"):
        register_custom_entity("BROKEN_RX", r"([unclosed")
    with pytest.raises(ValueError, match="unknown validator"):
        register_custom_entity("BAD_VALIDATOR", r"x", validator="crc32")
    with pytest.raises(ValueError, match="built-in"):
        unregister_custom_entity("EMAIL")
    # Java-dialect patterns that Python re rejects must register fine
    register_custom_entity("JAVA_DIALECT_RX", r"\p{L}{3}-[0-9]{4}")
    try:
        from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
            ENTITY_REGISTRY,
        )

        assert "JAVA_DIALECT_RX" in ENTITY_REGISTRY
    finally:
        unregister_custom_entity("JAVA_DIALECT_RX")
    # Python-only syntax is a JAVA error and must fail at registration
    with pytest.raises(ValueError, match="invalid Java regex"):
        register_custom_entity("PY_ONLY_RX", r"(?P<x>ACME)-[0-9]{6}")
