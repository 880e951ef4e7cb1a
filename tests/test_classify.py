"""Golden classification tests over reference-shaped fixtures (FIXTURES.md;
SURVEY §5.2.3): the engineered PII columns must trip their expected
entities at the reference's defaults (sample 1.0, threshold 0.1)."""

from __future__ import annotations

import random

import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
    build_findings,
    classify_columns,
    classify_columns_long,
    luhn_valid,
    mod97_valid,
    nhs_valid,
)

import pyspark.sql.functions as F


def _luhn_complete(prefix15: str) -> str:
    digits = [int(c) for c in prefix15]
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 0:  # these become the doubled positions once check digit appended
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return prefix15 + str((10 - total % 10) % 10)


@pytest.fixture(scope="module")
def payment_info(spark):
    rng = random.Random(42)
    rows = []
    for _ in range(200):
        card = _luhn_complete("".join(str(rng.randint(0, 9)) for _ in range(15)))
        rows.append(
            (
                str(rng.randint(100000, 999999)),
                "".join(str(rng.randint(0, 9)) for _ in range(8)),
                f"{rng.randint(10,99)}-{rng.randint(10,99)}-{rng.randint(10,99)}",
                f"{card[:4]}-{card[4:8]}-{card[8:12]}-{card[12:]}",
            )
        )
    return spark.createDataFrame(
        rows,
        ["BACS_Service_User_Number", "Bank_Account_Number", "Bank_Account_Sort_Code", "Payment_Card"],
    )


def test_payment_info_golden(spark, payment_info):
    result = {
        r["columnName"]: r["entityTypes"]
        for r in classify_columns(
            payment_info,
            ["CREDIT_CARD", "BANK_ACCOUNT", "UK_BANK_ACCOUNT", "UK_BANK_SORT_CODE"],
            1.0,
            0.1,
            validate=True,
        ).collect()
    }
    assert "CREDIT_CARD" in result["Payment_Card"]
    assert "UK_BANK_SORT_CODE" in result["Bank_Account_Sort_Code"]
    assert "BANK_ACCOUNT" in result["Bank_Account_Number"]
    assert "UK_BANK_ACCOUNT" in result["Bank_Account_Number"]
    # sort codes must NOT look like credit cards
    assert "CREDIT_CARD" not in result.get("Bank_Account_Sort_Code", [])


def test_network_info_golden(spark):
    rng = random.Random(42)
    rows = [
        (
            f"{rng.randint(1,223)}.{rng.randint(0,255)}.{rng.randint(0,255)}.{rng.randint(1,254)}",
            "2001:db8:85a3:0:0:8a2e:370:7334",
            f"10.{rng.randint(0,255)}.{rng.randint(0,255)}.{rng.randint(1,254)}",
            ":".join(f"{rng.randint(0,255):02x}" for _ in range(6)),
            str(rng.randint(10**9, 10**10 - 1)),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        [
            "IP_Address_IPv4_Individually_Identifiable",
            "IP_Address_IPv6_Individually_Identifiable",
            "IP_Address_Non_Individually_Identifiable",
            "MAC_Address",
            "id",
        ],
    )
    result = {
        r["columnName"]: r["entityTypes"]
        for r in classify_columns(df, ["IP_ADDRESS", "MAC_ADDRESS"], 1.0, 0.1).collect()
    }
    assert "IP_ADDRESS" in result["IP_Address_IPv4_Individually_Identifiable"]
    assert "IP_ADDRESS" in result["IP_Address_IPv6_Individually_Identifiable"]
    assert "IP_ADDRESS" in result["IP_Address_Non_Individually_Identifiable"]
    assert "MAC_ADDRESS" in result["MAC_Address"]
    assert "MAC_ADDRESS" not in result["IP_Address_IPv4_Individually_Identifiable"]


def test_individual_details_golden(spark):
    rng = random.Random(42)
    first = ["Amanda", "John", "Leonard", "Amber", "Susan", "Carl"]
    last = ["Barker", "Smith", "Richards", "Patel", "Willis", "Kent"]
    rows = [
        (
            f"{rng.choice(first)} {rng.choice(last)}",
            str(rng.randint(10**8, 10**9 - 1)),
            rng.choice(["Male", "Female"]),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, ["Billing_Account_Name", "Individual_Telephone_Number", "Individual_Gender"])
    result = {
        r["columnName"]: r["entityTypes"]
        for r in classify_columns(df, ["PERSON_NAME", "PHONE_NUMBER"], 1.0, 0.1).collect()
    }
    assert "PERSON_NAME" in result["Billing_Account_Name"]
    assert "PHONE_NUMBER" in result["Individual_Telephone_Number"]
    assert "Individual_Gender" not in result  # no detections on plain labels


def test_threshold_monotonicity(spark, payment_info):
    """Raising the threshold can only shrink the detected set."""
    lo = classify_columns(payment_info, ["CREDIT_CARD", "BANK_ACCOUNT"], 1.0, 0.05)
    hi = classify_columns(payment_info, ["CREDIT_CARD", "BANK_ACCOUNT"], 1.0, 0.95)
    lo_set = {(r["columnName"], e) for r in lo.collect() for e in r["entityTypes"]}
    hi_set = {(r["columnName"], e) for r in hi.collect() for e in r["entityTypes"]}
    assert hi_set <= lo_set


def test_sampling_still_detects(spark, payment_info):
    result = {
        r["columnName"]: r["entityTypes"]
        for r in classify_columns(payment_info, ["UK_BANK_SORT_CODE"], 0.5, 0.1).collect()
    }
    assert "UK_BANK_SORT_CODE" in result["Bank_Account_Sort_Code"]


def test_luhn_expression(spark):
    df = spark.createDataFrame(
        [("4111111111111111",), ("4111111111111112",), ("4111-1111-1111-1111",)],
        ["card"],
    )
    got = [r[0] for r in df.select(luhn_valid(F.col("card"))).collect()]
    assert got == [True, False, True]


def test_mod97_expression(spark):
    df = spark.createDataFrame(
        [
            ("GB82WEST12345698765432",),  # valid (public ISO 13616 example)
            ("GB82WEST12345698765431",),  # last digit corrupted
            ("DE89370400440532013000",),  # valid
            ("DE89 3704 0044 0532 0130 00",),  # valid with separators
            ("0532013000",),  # domestic digit form: validator passes through
        ],
        ["iban"],
    )
    got = [r[0] for r in df.select(mod97_valid(F.col("iban"))).collect()]
    assert got == [True, False, True, True, True]


def test_nhs_expression(spark):
    df = spark.createDataFrame(
        [("943 476 5919",), ("9434765919",), ("943 476 5918",), ("12345",)],
        ["nhs"],
    )
    got = [r[0] for r in df.select(nhs_valid(F.col("nhs"))).collect()]
    assert got == [True, True, False, False]


def test_validators_cut_false_positives(spark):
    """A digit-soup column matches BANK_ACCOUNT's IBAN alternative and the
    16-digit CREDIT_CARD format; with validate=True both checksums reject
    the fabricated values."""
    rng = random.Random(7)
    rows = [
        (
            "GB99" + "".join(str(rng.randint(0, 9)) for _ in range(18)),
            "".join(str(rng.randint(0, 9)) for _ in range(16)),
        )
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, ["iban_like_junk", "card_like_junk"])
    loose = classify_columns(df, ["BANK_ACCOUNT", "CREDIT_CARD"], 1.0, 0.5, validate=False)
    strict = classify_columns(df, ["BANK_ACCOUNT", "CREDIT_CARD"], 1.0, 0.5, validate=True)
    loose_set = {(r["columnName"], e) for r in loose.collect() for e in r["entityTypes"]}
    strict_set = {(r["columnName"], e) for r in strict.collect() for e in r["entityTypes"]}
    assert ("iban_like_junk", "BANK_ACCOUNT") in loose_set
    assert ("iban_like_junk", "BANK_ACCOUNT") not in strict_set
    assert ("card_like_junk", "CREDIT_CARD") in loose_set
    # ~1/10 of random 16-digit strings pass Luhn; at threshold 0.5 the
    # validated fraction cannot clear it
    assert ("card_like_junk", "CREDIT_CARD") not in strict_set


def test_context_disambiguates_digit_columns(spark):
    """The same all-digit values classify differently under a ``phone``
    header vs an ``account_number`` header: approximate entities require
    their column-name hint."""
    rng = random.Random(11)
    vals = ["0" + "".join(str(rng.randint(0, 9)) for _ in range(9)) for _ in range(100)]
    df = spark.createDataFrame([(v, v) for v in vals], ["phone", "account_number"])
    result = {
        r["columnName"]: set(r["entityTypes"])
        for r in classify_columns(df, ["PHONE_NUMBER", "BANK_ACCOUNT"], 1.0, 0.1).collect()
    }
    assert result["phone"] == {"PHONE_NUMBER"}
    assert result["account_number"] == {"BANK_ACCOUNT"}
    # with context off, both entities fire on both columns
    loose = {
        r["columnName"]: set(r["entityTypes"])
        for r in classify_columns(
            df, ["PHONE_NUMBER", "BANK_ACCOUNT"], 1.0, 0.1, use_context=False
        ).collect()
    }
    assert loose["phone"] == {"PHONE_NUMBER", "BANK_ACCOUNT"}
    assert loose["account_number"] == {"PHONE_NUMBER", "BANK_ACCOUNT"}


def test_exact_subform_clears_context_gate(spark):
    """A fully-determined dashed SSN (123-45-6789) must classify even in
    a column with no 'ssn'/'social' header; the bare 9-digit run stays
    hint-gated (recall fix: USA_SSN was wholesale approximate, silently
    dropping dashed SSNs from unhinted columns). Same split for
    UK_BANK_SORT_CODE's dashed 12-34-56 layout."""
    rows = [
        (f"{100 + i:03d}-{i % 90 + 10:02d}-{1000 + i:04d}", f"{100000000 + i}", f"{10 + i % 80:02d}-{20 + i % 70:02d}-{30 + i % 60:02d}")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["ref_code", "ref_digits", "branch_ref"])
    got = {
        r["columnName"]: set(r["entityTypes"])
        for r in classify_columns(
            df, ["USA_SSN", "UK_BANK_SORT_CODE"], 1.0, 0.1, use_context=True
        ).collect()
    }
    # dashed forms fire without hints
    assert "USA_SSN" in got.get("ref_code", set())
    assert "UK_BANK_SORT_CODE" in got.get("branch_ref", set())
    # bare digit runs stay gated in unhinted columns
    assert "USA_SSN" not in got.get("ref_digits", set())
    # ...but a hinted header still unlocks the generic form
    hinted = {
        r["columnName"]: set(r["entityTypes"])
        for r in classify_columns(
            df.withColumnRenamed("ref_digits", "ssn"),
            ["USA_SSN"], 1.0, 0.1, use_context=True,
        ).collect()
    }
    assert "USA_SSN" in hinted.get("ssn", set())


def test_long_form_fractions_exact(spark):
    df = spark.createDataFrame(
        [("a@b.co",), ("nope",), ("x@y.io",), (None,)],
        ["maybe_email"],
    )
    rows = classify_columns_long(df, ["EMAIL"]).collect()
    assert len(rows) == 1
    # 2 of 3 non-null values match
    assert abs(rows[0]["match_fraction"] - 0.6667) < 1e-9


def test_build_findings_shape(spark):
    df = spark.createDataFrame([("col_a", ["EMAIL"])], ["columnName", "entityTypes"])
    out = build_findings(
        df,
        data_source_type="s3",
        data_catalog_table="t",
        data_catalog_database="db",
        source_attrs={"s3_bucket_name": "b"},
    ).collect()[0]
    assert out["data_source_type"] == "s3"
    assert out["s3_bucket_name"] == "b"
    assert len(out["id"]) == 36  # uuid
    assert out["timestamp"] is not None


def test_classify_wide_schema_single_pass(spark):
    """SURVEY §7.3(c): classify must survive wide schemas. The unpivot
    design makes aggregate expressions scale with ENTITIES, not
    columns x entities — 150 columns against the full ~256-entity
    registry stays one stack + one hash aggregate."""
    import pyspark.sql.functions as F

    from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
        ENTITY_REGISTRY,
    )

    n_cols = 150
    df = spark.range(40).select(
        *[
            F.concat(F.lit(f"v{i}-"), F.col("id").cast("string")).alias(f"col_{i}")
            for i in range(n_cols)
        ]
    )
    out = classify_columns_long(df)  # full registry
    assert out.count() == n_cols * len(ENTITY_REGISTRY)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    # ONE aggregate pair around ONE shuffle: partial + Exchange + final
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan


def test_redact_cells_masks_full_cell_matches(spark):
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import redact_cells

    df = spark.createDataFrame(
        [
            ("079-28-1234", "plain note"),
            ("not an ssn", "user7@example.com"),
        ],
        ["a", "b"],
    )
    got = [tuple(r) for r in redact_cells(df, ["USA_SSN", "EMAIL"]).collect()]
    assert got == [
        ("[USA_SSN]", "plain note"),
        ("not an ssn", "[EMAIL]"),
    ]


def test_redact_cells_validator_gates_mask(spark):
    """With validate=True the checksum gates the mask exactly as it
    gates classification: a Luhn-valid card redacts, a one-digit-off
    fake passes through untouched."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import redact_cells

    df = spark.createDataFrame(
        [("4539578763621486",), ("4539578763621487",)], ["card"]
    )
    got = [r["card"] for r in redact_cells(df, ["CREDIT_CARD"], validate=True).collect()]
    assert got == ["[CREDIT_CARD]", "4539578763621487"]


def test_redact_text_in_prose(spark):
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import redact_text
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("mail user7@example.com or 10.1.2.3 ok",), ("no pii here",)], ["t"]
    )
    got = [
        r["out"]
        for r in df.select(
            redact_text(F.col("t"), ["EMAIL", "IP_ADDRESS"]).alias("out")
        ).collect()
    ]
    assert got == ["mail [EMAIL] or [IP_ADDRESS] ok", "no pii here"]


def test_name_derived_hints_gate_national_ids(spark):
    """Approximate national-ID entities with no curated context words use
    hints derived from their distinctive name tokens: a column literally
    named for the entity detects, while a generic national_id column does
    not light up every country's ID entity (the gate still gates)."""
    df = spark.createDataFrame(
        [("2345 6789 1234", "1234567890123"), ("3456 7891 2345", "9876543210987")],
        ["aadhaar_number", "national_id"],
    )
    got = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(df, detection_threshold=0.5).collect()
    }
    assert "INDIA_AADHAAR_NUMBER" in got.get("aadhaar_number", [])
    # the generic column matches many 13-digit national-ID patterns but
    # carries no distinctive hint, so the context gate drops them all
    for ent in got.get("national_id", []):
        assert "UNIQUE_MASTER_CITIZEN" not in ent and "NATIONAL_IDENTIFICATION" not in ent


def test_redact_text_no_partial_digit_run_leak(spark):
    """Regression (verified leak): the shorter PHONE pattern used to
    consume a 14-char prefix of a 16-digit card, leaving the last 4
    digits unmasked, and the '+' stayed outside the phone mask. The
    longest-pattern-first chain + leading-'+' wrapper masks both fully."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import redact_text

    df = spark.createDataFrame(
        [("call +1 415 555 0123, card 4111 1111 1111 1111",)], ["t"]
    )
    got = df.select(
        redact_text(F.col("t"), ["EMAIL", "PHONE_NUMBER", "CREDIT_CARD"]).alias("r")
    ).collect()[0]["r"]
    assert got == "call [PHONE_NUMBER], card [CREDIT_CARD]", got


def test_counts_form_merges_to_full_scan_classification(spark):
    """The mergeable count form: per-subset counts summed across subsets
    derive EXACTLY the classification a one-shot full scan produces
    (sum(matched)/sum(values) == avg) — the invariant behind file-level
    incremental classification."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
        classification_from_counts,
        classify_columns_counts,
    )

    rows_a = [(f"u{i}@ex.com", f"{100+i:03d}-{10+i%80:02d}-{1000+i:04d}") for i in range(30)]
    rows_b = [(f"plain {i}", f"note {i}") for i in range(70)]
    cols = ["contact", "ref"]
    full = spark.createDataFrame(rows_a + rows_b, cols)
    ent = ["EMAIL", "USA_SSN"]

    part_counts = [
        classify_columns_counts(spark.createDataFrame(rows, cols), ent, file_col=F.lit(tag))
        for tag, rows in (("a", rows_a), ("b", rows_b))
    ]
    merged = part_counts[0].unionByName(part_counts[1])
    got = {
        r["columnName"]: list(r["entityTypes"])
        for r in classification_from_counts(merged, ent, 0.25, column_names=cols).collect()
    }
    expected = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(full, ent, 1.0, 0.25).collect()
    }
    # EMAIL at 30% clears 0.25; the unhinted dashed-SSN column clears via
    # the exact sub-form — through the counts path too
    assert got == expected == {"contact": ["EMAIL"], "ref": ["USA_SSN"]}


def test_counts_form_without_context_never_leaks_exact_markers(spark):
    """A counts table written with exact_forms=True (the streaming sink
    default) derived with use_context=False must fold the internal
    '<entity>!exact' marker rows instead of surfacing them as bogus
    entity names."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
        classification_from_counts,
        classify_columns_counts,
    )

    # dashed SSNs in an unhinted column: the exact-form marker rows
    # clear the threshold by construction
    rows = [(f"{100+i:03d}-{10+i%80:02d}-{1000+i:04d}",) for i in range(20)]
    counts = classify_columns_counts(
        spark.createDataFrame(rows, ["ref"]), ["USA_SSN"], exact_forms=True
    )
    got = {
        r["columnName"]: list(r["entityTypes"])
        for r in classification_from_counts(
            counts, ["USA_SSN"], 0.25, column_names=["ref"], use_context=False
        ).collect()
    }
    for ents in got.values():
        assert all("!exact" not in e for e in ents), got
    # without the context gate the approximate entity keeps on raw
    # fraction alone; the marker row must be folded away, not listed
    assert got == {"ref": ["USA_SSN"]}
