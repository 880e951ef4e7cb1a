"""End-to-end lifecycle (SURVEY §5.2.4): onboard -> register/infer ->
classify -> publish -> tag-report, asserting the tracker state machine
false/false -> true/false -> true/true and final column comments."""

from __future__ import annotations

import csv
import random

import pytest

from automated_datastore_discovery_with_aws_glue_spark.catalog.engine import DiscoveryEngine


@pytest.fixture(scope="module")
def csv_source(tmp_path_factory):
    """payment_info-shaped CSV fixture (FIXTURES.md §7)."""
    rng = random.Random(42)
    d = tmp_path_factory.mktemp("payment_info")
    with open(d / "part1.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["BACS_Service_User_Number", "Bank_Account_Number", "Bank_Account_Sort_Code", "Payment_Card"])
        for _ in range(300):
            w.writerow(
                [
                    rng.randint(100000, 999999),
                    "".join(str(rng.randint(0, 9)) for _ in range(8)),
                    f"{rng.randint(10,99)}-{rng.randint(10,99)}-{rng.randint(10,99)}",
                    "-".join("".join(str(rng.randint(0, 9)) for _ in range(4)) for _ in range(4)),
                ]
            )
    return str(d)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return DiscoveryEngine(spark, str(tmp_path_factory.mktemp("state")), database="e2e_db")


ENTITIES = ["CREDIT_CARD", "UK_BANK_SORT_CODE", "BANK_ACCOUNT", "EMAIL"]


def test_full_lifecycle(spark, engine, csv_source):
    # 1. onboard: gate rejects untagged, accepts gdpr-scan=true
    assert not engine.onboard_source("s3", {"path": csv_source, "name": "payment_info"}, {})
    ok = engine.onboard_source(
        "s3",
        {"path": csv_source, "name": "payment_info", "format": "csv"},
        {"gdpr-scan": "true", "APP_ID": "42", "APP_NAME": "payments"},
    )
    assert ok
    row = engine.tracker().collect()[0]
    assert (row["data_catalog_entry"], row["glue_job_created"]) == (False, False)

    # replayed event MERGEs to a no-op (same natural key)
    engine.onboard_source(
        "s3",
        {"path": csv_source, "name": "payment_info", "format": "csv"},
        {"gdpr-scan": "true", "APP_ID": "42", "APP_NAME": "payments"},
    )
    assert engine.tracker().count() == 1

    # 2. register: schema inferred, catalog entry flipped
    registered = engine.register_pending("s3")
    assert registered == ["e2e_db.s3_payment_info"]
    assert spark.table("e2e_db.s3_payment_info").count() == 300
    row = engine.tracker().collect()[0]
    assert (row["data_catalog_entry"], row["glue_job_created"]) == (True, False)
    assert row["data_catalog_table_name"] == "s3_payment_info"

    # 3. classify: findings appended, state flips to true/true
    n = engine.classify_pending("s3", ENTITIES)
    assert n == 1
    row = engine.tracker().collect()[0]
    assert (row["data_catalog_entry"], row["glue_job_created"]) == (True, True)
    found = {
        r["columnName"]: r["entityTypes"]
        for r in engine.latest_findings().collect()
    }
    assert "UK_BANK_SORT_CODE" in found["Bank_Account_Sort_Code"]
    assert "CREDIT_CARD" in found["Payment_Card"]

    # idempotence: nothing pending anymore
    assert engine.classify_pending("s3", ENTITIES) == 0

    # 4. publish: column comments written back, 255-truncated
    n_comments = engine.publish_findings()
    assert n_comments >= 2
    comments = engine.column_comments("e2e_db.s3_payment_info")
    assert "Sensitive Data Element" in comments["Payment_Card"]
    assert "CREDIT_CARD" in comments["Payment_Card"]
    assert len(comments["Payment_Card"]) <= 255

    # 5. tag report: governance-tag subset captured
    report = engine.tag_report("s3").collect()
    assert len(report) == 1
    assert report[0]["app_id"] == "42"
    assert report[0]["app_name"] == "payments"
    assert report[0]["purpose_of_processing"] is None


def test_publish_one_catalog_interaction_per_table(spark, tmp_path, csv_source, monkeypatch):
    """Column comments land via ONE catalog call per table (grouped
    schema alter), never a per-column ALTER loop."""
    eng = DiscoveryEngine(spark, str(tmp_path), database="pub_db")
    eng.onboard_source(
        "s3",
        {"path": csv_source, "name": "payment_info", "format": "csv"},
        {"gdpr-scan": "true"},
    )
    eng.register_pending("s3")
    eng.classify_pending("s3", ENTITIES)

    table_calls: list[str] = []
    real = DiscoveryEngine._write_column_comments

    def spy(self, database, table, comments):
        table_calls.append(f"{database}.{table}")
        assert len(comments) >= 2  # grouped: all columns arrive together
        real(self, database, table, comments)

    monkeypatch.setattr(DiscoveryEngine, "_write_column_comments", spy)
    sql_calls: list[str] = []
    real_sql = spark.sql
    monkeypatch.setattr(
        spark, "sql", lambda q, *a, **k: (sql_calls.append(q), real_sql(q, *a, **k))[1]
    )
    n = eng.publish_findings()
    assert n >= 2
    assert table_calls == ["pub_db.s3_payment_info"]  # one interaction per table
    assert not [q for q in sql_calls if q.lstrip().upper().startswith("ALTER")]
    comments = eng.column_comments("pub_db.s3_payment_info")
    assert "CREDIT_CARD" in comments["Payment_Card"]


def test_second_classification_wins(spark, tmp_path, csv_source):
    """Re-classification produces a newer timestamp; latest_findings keeps
    only the newest run per table (J1 argmax semantics). Self-contained:
    builds its own engine + first classification (the previous shared
    module fixture made this test order-dependent — it failed in
    isolation)."""
    import pyspark.sql.functions as F

    engine = DiscoveryEngine(spark, str(tmp_path / "state"), database="reclass_db")
    engine.onboard_source(
        "s3",
        {"path": csv_source, "name": "payment_info", "format": "csv"},
        {"gdpr-scan": "true"},
    )
    engine.register_pending("s3")
    assert engine.classify_pending("s3", ENTITIES) == 1

    flip = spark.createDataFrame([(engine.tracker().collect()[0]["id"],)], ["id"])
    engine.store.merge(
        "tracker", flip, "id",
        set_on_match={"glue_job_created": F.lit(False)},
        insert_not_matched=False,
    )
    assert engine.classify_pending("s3", ENTITIES) == 1
    latest = engine.latest_findings()
    assert latest.select("timestamp").distinct().count() == 1
    total = engine.store.read("pii_findings")
    assert total.select("timestamp").distinct().count() == 2


def test_batched_flips_single_version_bump(spark, tmp_path):
    """register_pending/classify_pending MERGE all flips in ONE batch:
    exactly one tracker version bump per call regardless of how many
    sources are pending (VERDICT r1: no per-row full-table rewrites)."""
    import csv as _csv

    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="batch_db")
    for name in ("alpha", "beta", "gamma"):
        d = tmp_path / name
        d.mkdir()
        with open(d / "part.csv", "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["email", "note"])
            w.writerow([f"user@{name}.example.com", "hello"])
        assert eng.onboard_source(
            "s3",
            {"path": str(d), "name": name, "format": "csv"},
            {"gdpr-scan": "true"},
        )

    v_before = eng.store.latest_version("tracker")
    assert len(eng.register_pending("s3")) == 3
    assert eng.store.latest_version("tracker") == v_before + 1

    v_before = eng.store.latest_version("tracker")
    f_before = eng.store.latest_version("pii_findings")
    assert eng.classify_pending("s3", ["EMAIL"]) == 3
    assert eng.store.latest_version("tracker") == v_before + 1
    assert eng.store.latest_version("pii_findings") == f_before + 1
    # all three flipped to classified
    assert eng.tracker().filter("glue_job_created AND data_catalog_entry").count() == 3


def test_rds_tag_report_three_step_deref(spark, tmp_path):
    """connection name -> JDBC URL -> cluster endpoint -> governance tags,
    as two chained lookup joins (ref lambda/rds-tag-report/app.py:197-212).
    Input is the CATALOGED rows (the reference's P4): an uncataloged rds
    source must not reach the report (its NULL table name is half the
    merge key), and a re-run REPLACES the row (put_item semantics)."""
    import pyspark.sql.functions as F

    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="rds_db")
    eng.onboard_source(
        "rds",
        {"connection": "conn-app", "path": "ignored", "name": "appdb"},
        {"gdpr-scan": "true"},
    )
    # a second source that never gets cataloged: must stay out of the report
    eng.onboard_source(
        "rds",
        {"connection": "conn-other", "path": "ignored2", "name": "otherdb"},
        {"gdpr-scan": "true"},
    )
    # catalog the first source (the reference's rds-glue-tracking chain
    # flips data_catalog_entry on the Glue CreateTable event)
    flip = eng.tracker().filter(
        F.col("data_source_attrs")["connection"] == "conn-app"
    ).select("id", "data_source_type")
    eng.store.merge(
        "tracker",
        flip,
        "id",
        set_on_match={
            "data_catalog_entry": F.lit(True),
            "data_catalog_table_name": F.lit("rds_appdb"),
        },
        insert_not_matched=False,
        partition_by="data_source_type",
    )
    connections = spark.createDataFrame(
        [
            ("conn-app", "jdbc:postgresql://app-cluster.example.internal:5432/app"),
            ("conn-other", "jdbc:postgresql://other.example.internal:5432/x"),
        ],
        ["connection_name", "jdbc_url"],
    )
    clusters = spark.createDataFrame(
        [
            (
                "app-cluster.example.internal",
                {"APP_ID": "42", "APP_NAME": "payments", "Business Function": "billing"},
            )
        ],
        ["endpoint", "tags"],
    )
    report = eng.rds_tag_report(connections, clusters).collect()
    assert len(report) == 1  # the uncataloged source is excluded
    row = report[0]
    assert row["connection_name"] == "conn-app"
    assert row["endpoint"] == "app-cluster.example.internal"
    assert row["app_id"] == "42" and row["app_name"] == "payments"
    assert row["business_function"] == "billing"
    # untagged keys surface as NULL, not errors
    assert row["data_subjects"] is None

    # re-run with CHANGED cluster tags: the report row is replaced, not
    # frozen at the first run's values (and the re-run doesn't trip the
    # NULL-merge-key guard on the still-uncataloged source)
    clusters2 = spark.createDataFrame(
        [("app-cluster.example.internal", {"APP_ID": "42", "APP_NAME": "payments-v2"})],
        ["endpoint", "tags"],
    )
    report2 = eng.rds_tag_report(connections, clusters2).collect()
    assert len(report2) == 1
    assert report2[0]["app_name"] == "payments-v2"


def test_publish_findings_pins_findings_snapshot(spark, tmp_path, csv_source):
    """A classify run racing a publish invalidates it (VersionId guard)."""
    from automated_datastore_discovery_with_aws_glue_spark.catalog.engine import FINDINGS
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="cas_db")
    eng.onboard_source(
        "s3", {"path": csv_source, "name": "payment_info"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    eng.classify_pending("s3", ENTITIES)
    assert eng.publish_findings() > 0  # no concurrent writer: publishes

    pinned = eng.store.latest_version(FINDINGS)
    real_latest = eng.latest_findings

    def racing_latest():
        out = real_latest()
        # simulate a concurrent classify committing mid-publish
        eng.store.append(FINDINGS, eng.store.read(FINDINGS).limit(1))
        return out

    eng.latest_findings = racing_latest
    try:
        with pytest.raises(ConcurrentWriteError):
            eng.publish_findings()
    finally:
        eng.latest_findings = real_latest
    assert eng.store.latest_version(FINDINGS) == pinned + 1


def test_recrawl_schema_evolution_preserves_comments(spark, tmp_path):
    """The reference's crawlers re-run daily with SchemaChangePolicy
    UPDATE_IN_DATABASE / DeleteBehavior LOG
    (`lambda/catalog-creator-s3/app.py:196-198`): a drifted source must
    evolve the catalog table (new column added, vanished column retained
    as typed NULL and reported) WITHOUT losing the column comments that
    publish_findings wrote back."""
    src = tmp_path / "crm"
    src.mkdir()
    with open(src / "part1.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["customer_email", "legacy_code", "note"])
        for i in range(50):
            w.writerow([f"user{i}@example.com", f"L{i:04d}", f"note {i}"])

    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="recrawl_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "crm", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    eng.classify_pending("s3", ["EMAIL"])
    assert eng.publish_findings() >= 1
    before = eng.column_comments("recrawl_db.s3_crm")
    assert "EMAIL" in before["customer_email"]

    # drift: legacy_code disappears, phone appears
    (src / "part1.csv").unlink()
    with open(src / "part1.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["customer_email", "note", "phone"])
        for i in range(60):
            w.writerow([f"user{i}@example.com", f"note {i}", f"+44 20 7946 {i:04d}"])

    report = eng.recrawl("s3")
    assert report == [
        {
            "table": "recrawl_db.s3_crm",
            "skipped": False,
            "added": ["phone"],
            "removed": ["legacy_code"],
            "retyped": [],
        }
    ]
    t = spark.table("recrawl_db.s3_crm")
    assert t.count() == 60
    # evolved: new column present, vanished column retained as NULLs
    assert "phone" in t.columns and "legacy_code" in t.columns
    assert t.filter(t["legacy_code"].isNotNull()).count() == 0
    # published PII markings survive the rewrite
    after = eng.column_comments("recrawl_db.s3_crm")
    assert after["customer_email"] == before["customer_email"]

    # schema drift re-opens classification (the crawler-update ->
    # scheduled classify-job chain): the new phone column gets findings
    assert eng.classify_pending("s3", ["EMAIL", "PHONE_NUMBER"]) == 1
    found = {r["columnName"]: r["entityTypes"] for r in eng.latest_findings().collect()}
    assert "PHONE_NUMBER" in found.get("phone", "")

    # no-drift re-crawl: the unchanged content fingerprint short-circuits
    # the whole pass — no source scan, no table rewrite, no comment churn
    report2 = eng.recrawl("s3")
    assert report2 == [
        {"table": "recrawl_db.s3_crm", "skipped": True, "added": [], "removed": [], "retyped": []}
    ]
    t2 = spark.table("recrawl_db.s3_crm")
    assert t2.columns == t.columns and t2.count() == 60
    assert eng.column_comments("recrawl_db.s3_crm")["customer_email"] == before["customer_email"]
    # no drift -> classification stays closed (no wasted re-runs)
    assert eng.classify_pending("s3", ["EMAIL"]) == 0


def test_recrawl_fingerprint_incremental_classification(spark, tmp_path):
    """The job-bookmark the reference disabled
    (`lambda/s3-glue-job-creator/app.py:17`): after a classify pass, an
    unchanged source costs ZERO scans on re-crawl + re-classify; a
    content-only change (same schema, new rows) re-opens classification."""
    src = tmp_path / "leads"
    src.mkdir()

    def write_rows(n):
        with open(src / "part1.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["customer_email", "note"])
            for i in range(n):
                w.writerow([f"user{i}@example.com", f"note {i}"])

    write_rows(40)
    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="incr_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "leads", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    assert eng.classify_pending("s3", ["EMAIL"]) == 1

    reads = []
    orig = eng._read_source
    eng._read_source = lambda st, attrs, paths=None, **kw: (reads.append(1), orig(st, attrs, paths, **kw))[1]

    # unchanged source: recrawl skips with zero source scans, and the
    # second classify pass scans nothing
    report = eng.recrawl("s3")
    assert report[0]["skipped"] is True
    assert reads == [], "unchanged source must not be re-read"
    assert eng.classify_pending("s3", ["EMAIL"]) == 0

    # content-only drift (same columns, more rows): fingerprint changes,
    # recrawl processes it and re-opens classification
    write_rows(55)
    report2 = eng.recrawl("s3")
    assert report2[0]["skipped"] is False
    assert report2[0]["added"] == [] and report2[0]["retyped"] == []
    assert reads, "drifted source must be re-read"
    assert eng.classify_pending("s3", ["EMAIL"]) == 1
    # and the refreshed fingerprint closes the loop again — with ZERO
    # tracker version churn for the skipped pass (a scheduled daily
    # recrawl must not burn a state version per no-op run)
    v_before = eng.store.latest_version("tracker")
    assert eng.recrawl("s3")[0]["skipped"] is True
    assert eng.store.latest_version("tracker") == v_before
    assert eng.classify_pending("s3", ["EMAIL"]) == 0


def test_register_pending_disambiguates_basename_collisions(spark, tmp_path):
    """Two sources whose paths share a basename must get DISTINCT catalog
    tables (regression: the second silently overwrote the first)."""
    for bucket, col in (("bucketa", "email_a"), ("bucketb", "email_b")):
        d = tmp_path / bucket / "users"
        d.mkdir(parents=True)
        with open(d / "part1.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow([col])
            w.writerow([f"x@{bucket}.example.com"])

    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="collide_db")
    for bucket in ("bucketa", "bucketb"):
        eng.onboard_source(
            "s3", {"path": str(tmp_path / bucket / "users")}, {"gdpr-scan": "true"}
        )
    registered = eng.register_pending("s3")
    assert len(registered) == 2 and len(set(registered)) == 2
    cols = {tuple(spark.table(fq).columns) for fq in registered}
    assert cols == {("email_a",), ("email_b",)}
    # tracker rows record the distinct table names
    names = [r["data_catalog_table_name"] for r in eng.tracker().collect()]
    assert len(set(names)) == 2


def test_file_level_incremental_classification(spark, tmp_path):
    """File-granular re-classification (the 100 TB win over the
    reference's disabled bookmark): a second classify pass reads ONLY
    the new/changed files, merges their counts with the kept files'
    stored counts, and the derived findings are identical to a full
    rescan of the whole source — including after a file DELETE (zero
    reads, counts drop out) and after an entity-set change (all files
    invalidated)."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import classify_columns

    src = tmp_path / "mailbox"
    src.mkdir()

    def write_file(name, n, p_email, q_email):
        with open(src / name, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["col_p", "col_q"])
            for i in range(n):
                w.writerow(
                    [
                        f"p{i}@example.com" if p_email else f"plain p {i}",
                        f"q{i}@example.com" if q_email else f"plain q {i}",
                    ]
                )

    # a.csv: col_p all emails, col_q none
    write_file("a.csv", 40, True, False)
    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="filedelta_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "mailbox", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")

    read_paths: list[list[str] | None] = []
    orig = eng._read_source
    def spy(st, attrs, paths=None, **kw):
        read_paths.append(sorted(paths) if paths else paths)
        return orig(st, attrs, paths, **kw)
    eng._read_source = spy

    assert eng.classify_pending("s3", ["EMAIL"], detection_threshold=0.5) == 1
    assert read_paths == [[str(src / "a.csv")]]
    fq = "filedelta_db.s3_mailbox"
    found = {r["columnName"]: list(r["entityTypes"]) for r in eng.latest_findings().collect()}
    assert found == {"col_p": ["EMAIL"]}

    # b.csv lands: col_q all emails, col_p none — merged fractions are
    # p: 40/120 = 0.33 (below 0.5), q: 80/120 = 0.67 (above)
    write_file("b.csv", 80, False, True)
    assert eng.recrawl("s3")[0]["skipped"] is False
    read_paths.clear()
    assert eng.classify_pending("s3", ["EMAIL"], detection_threshold=0.5) == 1
    # the recrawl read the full source; the CLASSIFY pass read only b.csv
    classify_reads = [p for p in read_paths if p is not None]
    assert classify_reads == [[str(src / "b.csv")]], read_paths
    found = {
        r["columnName"]: list(r["entityTypes"])
        for r in eng.latest_findings().filter("data_catalog_table = 's3_mailbox'").collect()
    }
    # delta-only (q=1.0, p=0) and kept-only (p=1.0, q=0) would both be
    # wrong in opposite directions; only the true merge flips p off AND
    # q on -- and it must equal a direct full rescan of the table
    expected = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(spark.table(fq), ["EMAIL"], 1.0, 0.5).collect()
    }
    assert found == expected == {"col_q": ["EMAIL"]}

    # delete b.csv: classification re-opens, the classify pass reads
    # NOTHING (a.csv's counts are still good), b's counts drop out and
    # col_p's 100% comes back -- again bit-equal to the full rescan
    (src / "b.csv").unlink()
    assert eng.recrawl("s3")[0]["skipped"] is False
    read_paths.clear()
    assert eng.classify_pending("s3", ["EMAIL"], detection_threshold=0.5) == 1
    assert [p for p in read_paths if p is not None] == []
    found = {
        r["columnName"]: list(r["entityTypes"])
        for r in eng.latest_findings().filter("data_catalog_table = 's3_mailbox'").collect()
    }
    expected = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(spark.table(fq), ["EMAIL"], 1.0, 0.5).collect()
    }
    assert found == expected == {"col_p": ["EMAIL"]}

    # entity-set change invalidates every file's counts: touch a.csv to
    # re-open, classify with a DIFFERENT detector set -> a.csv re-read
    # (counts for [EMAIL] cannot answer [EMAIL, PHONE_NUMBER])
    write_file("a.csv", 40, True, False)
    assert eng.recrawl("s3")[0]["skipped"] is False
    read_paths.clear()
    assert eng.classify_pending("s3", ["EMAIL", "PHONE_NUMBER"], detection_threshold=0.5) == 1
    assert [p for p in read_paths if p is not None] == [[str(src / "a.csv")]]


def test_recrawl_append_only_fast_path(spark, tmp_path):
    """Append-only sources (daily files landing in a prefix): recrawl
    appends ONLY the new files to the managed copy — no re-read of old
    data, no table rewrite (asserted via untouched data-file inodes),
    published comments survive without re-apply, and the re-opened
    classification scans only the delta. Changed files and schema drift
    still fall back to the full evolve-rewrite."""
    import os

    src = tmp_path / "dailydrop"
    src.mkdir()

    def write_file(name, rows):
        with open(src / name, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["customer_email", "note"])
            for i in rows:
                w.writerow([f"user{i}@example.com", f"note {i}"])

    write_file("day1.csv", range(30))
    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="append_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "dailydrop", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    assert eng.classify_pending("s3", ["EMAIL"]) == 1
    assert eng.publish_findings() >= 1
    fq = "append_db.s3_dailydrop"
    comments_before = eng.column_comments(fq)
    assert "EMAIL" in comments_before["customer_email"]

    def table_file_stats():
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {fq}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        )
        d = loc[len("file:"):] if loc.startswith("file:") else loc
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    files_before = table_file_stats()

    reads = []
    orig = eng._read_source
    eng._read_source = lambda st, attrs, paths=None, **kw: (reads.append(sorted(paths) if paths else None), orig(st, attrs, paths, **kw))[1]

    # day 2 lands: recrawl APPENDS only day2.csv
    write_file("day2.csv", range(100, 140))
    report = eng.recrawl("s3")
    assert report[0]["appended_files"] == 1
    assert report[0]["added"] == [] and report[0]["removed"] == []
    assert reads == [[str(src / "day2.csv")]], reads
    assert spark.table(fq).count() == 70
    # the original data files were NOT rewritten (same inodes)
    files_after = table_file_stats()
    assert set(files_before) <= set(files_after)
    assert all(files_after[f] == ino for f, ino in files_before.items())
    # comments survived without a re-apply pass
    assert eng.column_comments(fq)["customer_email"] == comments_before["customer_email"]

    # classification re-opened; the classify pass reads only day2.csv
    reads.clear()
    assert eng.classify_pending("s3", ["EMAIL"]) == 1
    assert reads == [[str(src / "day2.csv")]], reads

    # a CHANGED old file disables the fast path (full evolve-rewrite)
    write_file("day1.csv", range(25))
    reads.clear()
    report = eng.recrawl("s3")
    assert "appended_files" not in report[0]
    assert report[0]["skipped"] is False
    assert spark.table(fq).count() == 65

    # schema drift in a NEW file also declines the fast path: the
    # delta-only inference SEES the extra column and routes to the full
    # path rather than appending misaligned rows. (Whole-dir CSV
    # inference then still reads the FIRST file's header — discovering a
    # column that exists only in newer CSVs is a CSV-format limitation,
    # not a fast-path one; parquet/json sources merge schemas.)
    with open(src / "day3.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["customer_email", "note", "phone"])
        for i in range(5):
            w.writerow([f"x{i}@example.com", f"n{i}", f"+44 20 7946 {i:04d}"])
    report = eng.recrawl("s3")
    assert "appended_files" not in report[0]
    assert report[0]["skipped"] is False
    assert spark.table(fq).count() == 70


def test_engine_on_conditional_backend_with_maintain(spark, tmp_path):
    """The whole discovery lifecycle runs on the rename-less
    conditional-PUT commit backend (every tracker/findings/stats/manifest
    mutation commits via claim + pointer CAS), and `maintain()` trims
    every state table to the retention window while keeping reads
    alive."""
    from automated_datastore_discovery_with_aws_glue_spark.state.commit import ConditionalPutCommitBackend

    src = tmp_path / "condsrc"
    src.mkdir()

    def write_rows(name, n, start=0):
        with open(src / name, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["customer_email", "note"])
            for i in range(start, start + n):
                w.writerow([f"user{i}@example.com", f"note {i}"])

    write_rows("a.csv", 20)
    eng = DiscoveryEngine(
        spark,
        str(tmp_path / "state"),
        database="cond_db",
        commit_backend=ConditionalPutCommitBackend(),
    )
    eng.onboard_source(
        "s3", {"path": str(src), "name": "condsrc", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    assert eng.classify_pending("s3", ["EMAIL"]) == 1
    found = {r["columnName"]: r["entityTypes"] for r in eng.latest_findings().collect()}
    assert "EMAIL" in found["customer_email"]

    # drift -> append-only fast path -> incremental classify, all through
    # the conditional commit protocol
    write_rows("b.csv", 15, start=100)
    assert eng.recrawl("s3")[0]["appended_files"] == 1
    assert eng.classify_pending("s3", ["EMAIL"]) == 1
    assert spark.table("cond_db.s3_condsrc").count() == 35

    # several versions accumulated; maintain() trims every table
    before = {t: len(eng.store.versions(t)) for t in ("tracker", "pii_findings", "classify_stats", "crawl_manifest")}
    assert before["tracker"] >= 3
    kept = eng.maintain(keep=1)
    assert set(before) <= set(kept)
    assert all(v == 1 for t, v in kept.items())
    # reads still good after the trim
    assert eng.tracker().count() == 1
    assert {r["columnName"] for r in eng.latest_findings().collect()} == {"customer_email"}


def test_partitioned_source_incremental_classification(spark, tmp_path):
    """Hive-partitioned sources (date=.../ dirs): the partition COLUMN
    survives the explicit-file delta reads (basePath pinned), so the
    append-only recrawl appends rows WITH their partition value and the
    incremental classification still equals a full rescan — including
    detections on the partition column itself."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import classify_columns

    src = tmp_path / "partsrc"

    def write_part(day, start):
        d = src / f"batch_tag={day}"
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "part.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["contact", "note"])
            for i in range(start, start + 20):
                w.writerow([f"u{i}@example.com", f"note {i}"])

    write_part("first", 0)
    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="part_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "partsrc", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    fq = "part_db.s3_partsrc"
    assert "batch_tag" in spark.table(fq).columns  # discovered partition col
    assert eng.classify_pending("s3", ["EMAIL", "PERSON_NAME"]) == 1

    # new partition dir lands: append-only fast path keeps the column
    write_part("second", 100)
    report = eng.recrawl("s3")
    assert report[0].get("appended_files") == 1, report
    t = spark.table(fq)
    assert t.count() == 40
    assert t.filter("batch_tag = 'second'").count() == 20

    reads = []
    orig = eng._read_source
    eng._read_source = lambda st, attrs, paths=None, **kw: (reads.append(paths), orig(st, attrs, paths, **kw))[1]
    assert eng.classify_pending("s3", ["EMAIL", "PERSON_NAME"]) == 1
    assert len([p for p in reads if p]) == 1  # delta file only

    found = {
        r["columnName"]: list(r["entityTypes"])
        for r in eng.latest_findings().filter("data_catalog_table = 's3_partsrc'").collect()
    }
    expected = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(spark.table(fq), ["EMAIL", "PERSON_NAME"], 1.0, 0.1).collect()
    }
    assert found == expected
    assert "EMAIL" in found["contact"]


def test_incremental_classification_with_uri_escapable_filenames(spark, tmp_path):
    """Files whose paths contain URI-escapable characters (spaces, '+'):
    input_file_name() returns a percent-encoded URI while the listing
    keys are raw relpaths — the per-file counts must still attribute
    (the old inner join silently dropped them, permanently losing the
    file's PII counts while the sentinel pinned its signature)."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import classify_columns

    src = tmp_path / "in box"  # escapable char in the ROOT too

    src.mkdir()

    def write_file(name, n, p_email, q_email):
        with open(src / name, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["col_p", "col_q"])
            for i in range(n):
                w.writerow(
                    [
                        f"p{i}@example.com" if p_email else f"plain p {i}",
                        f"q{i}@example.com" if q_email else f"plain q {i}",
                    ]
                )

    write_file("week 1+a.csv", 40, True, False)
    eng = DiscoveryEngine(spark, str(tmp_path / "state"), database="uriesc_db")
    eng.onboard_source(
        "s3", {"path": str(src), "name": "inbox", "format": "csv"}, {"gdpr-scan": "true"}
    )
    eng.register_pending("s3")
    assert eng.classify_pending("s3", ["EMAIL"], detection_threshold=0.5) == 1
    found = {r["columnName"]: list(r["entityTypes"]) for r in eng.latest_findings().collect()}
    assert found == {"col_p": ["EMAIL"]}  # counts attributed, not dropped

    # second pass: the escaped-name file's sig must be recognized as
    # KEPT (no re-read), and the new escapable-name delta file's counts
    # must MERGE — p: 40/120 < 0.5 flips off, q: 80/120 > 0.5 flips on.
    # A dropped delta would leave {col_p: EMAIL}; a dropped kept side
    # would give q=1.0 with p missing entirely.
    write_file("week 2 b.csv", 80, False, True)
    assert eng.recrawl("s3")[0]["skipped"] is False
    read_paths = []
    orig = eng._read_source
    eng._read_source = lambda st, attrs, paths=None, **kw: (
        read_paths.append(sorted(paths) if paths else paths) or orig(st, attrs, paths, **kw)
    )
    assert eng.classify_pending("s3", ["EMAIL"], detection_threshold=0.5) == 1
    assert [p for p in read_paths if p is not None] == [[str(src / "week 2 b.csv")]]
    fq = "uriesc_db.s3_inbox"
    found = {
        r["columnName"]: list(r["entityTypes"])
        for r in eng.latest_findings().filter("data_catalog_table = 's3_inbox'").collect()
    }
    expected = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(spark.table(fq), ["EMAIL"], 1.0, 0.5).collect()
    }
    assert found == expected == {"col_q": ["EMAIL"]}


def test_sig_delta_is_distributed_at_million_file_scale(spark):
    """The file-signature diff must never materialize the prior stats on
    the driver: a synthetic million-file listing diffs against a
    3M-row stats table as pure joins, and only the 3-file delta ever
    collects."""
    import pyspark.sql.functions as F

    from automated_datastore_discovery_with_aws_glue_spark.catalog.engine import DiscoveryEngine

    n = 1_000_000
    listing = spark.range(n).select(
        F.format_string("part-%07d.csv", F.col("id")).alias("file"),
        # files 7 and 11 changed (new sig); file n-1 deleted from the
        # listing -> replaced by a NEW file beyond the prior range
        F.when(F.col("id").isin(7, 11), F.lit("new-sig"))
        .otherwise(F.lit("old-sig"))
        .alias("sig"),
    ).where(F.col("id") < n - 1).unionByName(
        spark.range(1).select(
            F.lit(f"part-{n}.csv").alias("file"), F.lit("old-sig").alias("sig")
        )
    )
    prior = (
        spark.range(n)
        .select(
            F.lit("src1").alias("source_id"),
            F.format_string("part-%07d.csv", F.col("id")).alias("file"),
            F.lit("old-sig").alias("sig"),
        )
        .crossJoin(spark.range(3).select(F.format_string("c%d", F.col("id")).alias("columnName")))
        .select(
            "source_id", "file", "sig", "columnName",
            F.lit("EMAIL").alias("entity"),
            F.lit(1).cast("long").alias("n_matched"),
            F.lit(2).cast("long").alias("n_values"),
        )
    )
    kept_stats, delta = DiscoveryEngine.sig_delta(listing, prior)
    delta_rows = sorted(r["file"] for r in delta.collect())
    assert delta_rows == ["part-0000007.csv", "part-0000011.csv", f"part-{n}.csv"]
    # kept: every unchanged, still-listed file's stats rows — changed
    # (2) and deleted (1) files' rows drop out: (1M - 3) files x 3 cols
    assert kept_stats.count() == (n - 3) * 3
