"""Source readers (SURVEY §2.1 S2/S3/S11/S12): schema inference, JSON
item merge, whole-text reads, and the SQL batch executor."""

from __future__ import annotations

import pytest

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import (
    read_csv_source,
    read_jdbc,
    read_json_items,
    read_text_whole,
    run_sql_batch,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("readers")


def test_csv_infers_schema_and_header(spark, workdir):
    p = workdir / "merchants.csv"
    p.write_text("id,name,score\n1,alpha,2.5\n2,beta,3.5\n")
    df = read_csv_source(spark, str(p))
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["id"] in ("int", "bigint") and types["score"] == "double"
    assert df.count() == 2


def test_csv_multiline_quoted(spark, workdir):
    p = workdir / "addresses.csv"
    p.write_text('id,address\n1,"12 High St\nLondon"\n2,"solo"\n')
    df = read_csv_source(spark, str(p), multi_line=True)
    rows = {r["id"]: r["address"] for r in df.collect()}
    assert rows[1] == "12 High St\nLondon" and df.count() == 2


def test_json_items_merges_sparse_schemas(spark, workdir):
    p = workdir / "items.json"
    p.write_text('{"id": "a", "city": "Leeds"}\n{"id": "b", "mac": "00:11:22:33:44:55"}\n')
    df = read_json_items(spark, str(p))
    # per-record attributes union into one inferred schema, absent -> null
    assert set(df.columns) == {"id", "city", "mac"}
    byid = {r["id"]: r for r in df.collect()}
    assert byid["a"]["mac"] is None and byid["b"]["city"] is None


def test_text_whole_reads_one_row_per_file(spark, workdir):
    p = workdir / "ddl.sql"
    script = "CREATE TABLE t (id INT);\nINSERT INTO t VALUES (1);"
    p.write_text(script)
    rows = read_text_whole(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0]["value"] == script


def test_run_sql_batch_splits_and_executes(spark):
    out = run_sql_batch(
        spark,
        """
        SELECT 1 AS a ;
        ; ;
        SELECT 2 AS b
        """,
    )
    assert len(out) == 2  # empty fragments dropped
    assert out[0].collect()[0]["a"] == 1 and out[1].collect()[0]["b"] == 2


def test_read_jdbc_is_lazy_until_load(spark):
    # no JDBC driver ships in this environment: the reader must fail at
    # load() with the driver-resolution error, not at option-building —
    # proving the option plumbing (url/dbtable/partitioning) is sound
    with pytest.raises(Exception) as exc:
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost:5432/nope",
            "public.t",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        )
    assert "driver" in str(exc.value).lower() or "connection" in str(exc.value).lower()


def test_read_jdbc_live_roundtrip_partitioned_pushdown(spark):
    """Live S4 path against embedded Derby (ships with Spark): the
    partitioned read produces one task per bounded range, and Spark
    pushes filters/column pruning into the database (`*`-marked =
    handled by the source, not re-evaluated)."""
    import pyspark.sql.functions as F

    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection("jdbc:derby:memory:s4db;create=true")
    try:
        st = conn.createStatement()
        try:
            st.execute("CREATE TABLE billing (id INT PRIMARY KEY, name VARCHAR(50), amount DOUBLE)")
            for i in range(20):
                st.execute(f"INSERT INTO billing VALUES ({i}, 'acct{i}', {i * 1.5})")
        finally:
            st.close()
    finally:
        conn.close()  # don't pin the embedded DB in the shared JVM

    df = read_jdbc(
        spark,
        "jdbc:derby:memory:s4db",
        "billing",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4  # bounded-range query per task
    assert df.count() == 20

    filtered = df.filter(F.col("AMOUNT") > 10).select("ID", "NAME")
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "*GreaterThan(AMOUNT,10.0)" in plan, plan  # filter ran in the DB
    assert "ReadSchema: struct<ID:int,NAME:string>" in plan, plan  # pruned
    assert sorted(r["ID"] for r in filtered.collect()) == list(range(7, 20))


def test_jdbc_information_schema_scan(spark):
    """S5 over JDBC: list user tables through the database's own
    information schema (Derby: SYS.SYSTABLES with TABLETYPE 'T'),
    mirroring the reference's information_schema.tables query
    (`lambda/rds-glue-initial/app.py:21-23,445-470`)."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection("jdbc:derby:memory:s5db;create=true")
    try:
        st = conn.createStatement()
        try:
            st.execute("CREATE TABLE t_one (id INT)")
            st.execute("CREATE TABLE t_two (id INT)")
        finally:
            st.close()
    finally:
        conn.close()
    tables = read_jdbc(
        spark,
        "jdbc:derby:memory:s5db",
        "(SELECT tablename FROM SYS.SYSTABLES WHERE tabletype = 'T') q",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    assert sorted(r[0] for r in tables.collect()) == ["T_ONE", "T_TWO"]


def test_jdbc_scan_options_partitioned_matrix():
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import jdbc_scan_options

    opts = jdbc_scan_options(
        "jdbc:postgresql://db:5432/app",
        "public.orders",
        properties={"user": "u", "password": "p", "driver": "org.postgresql.Driver"},
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=6_000_000,
        num_partitions=64,
    )
    assert opts["url"] == "jdbc:postgresql://db:5432/app"
    assert opts["dbtable"] == "public.orders"
    # credential/driver passthrough
    assert opts["user"] == "u" and opts["driver"] == "org.postgresql.Driver"
    # the parallel-scan contract: one bounded-range query per partition
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"


def test_jdbc_scan_options_unpartitioned_and_defaults():
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import jdbc_scan_options

    opts = jdbc_scan_options("jdbc:postgresql://db/app", "t")
    assert "partitionColumn" not in opts and "numPartitions" not in opts
    # default partition count applies once a full spec is given
    opts = jdbc_scan_options(
        "jdbc:postgresql://db/app", "t", partition_column="id", lower_bound=0, upper_bound=10
    )
    assert opts["numPartitions"] == "8"


def test_jdbc_scan_options_partial_partition_spec_rejected():
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import jdbc_scan_options

    with pytest.raises(ValueError, match="partition"):
        jdbc_scan_options("jdbc:x://h/d", "t", partition_column="id", lower_bound=0)
    with pytest.raises(ValueError, match="partition"):
        jdbc_scan_options("jdbc:x://h/d", "t", upper_bound=10)
    # num_partitions alone used to be silently dropped — the exact
    # single-partition scan the contract forbids
    with pytest.raises(ValueError, match="partition"):
        jdbc_scan_options("jdbc:x://h/d", "t", num_partitions=16)


def test_orc_roundtrip_preserves_values_types_and_partitions(spark, tmp_path):
    import datetime as dt

    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import orc_roundtrip

    df = spark.createDataFrame(
        [
            (1, "A", 10.5, dt.datetime(2024, 1, 1, 12, 0, 0)),
            (2, "B", -3.25, dt.datetime(2024, 6, 30, 23, 59, 59)),
            (3, "A", 0.0, dt.datetime(2024, 2, 29, 0, 0, 0)),
        ],
        "id long, status string, amount double, ts timestamp",
    )
    back = orc_roundtrip(spark, df, str(tmp_path / "orc"), partition_by="status")
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 3
    # partition column comes back with values intact
    assert rows[1]["status"] == "A" and rows[2]["status"] == "B"
    assert rows[2]["amount"] == -3.25
    assert rows[2]["ts"] == dt.datetime(2024, 6, 30, 23, 59, 59)
    # overwrite-idempotent: a second roundtrip of a SMALLER frame never
    # leaks rows from the first write
    back2 = orc_roundtrip(
        spark, df.filter("id = 1"), str(tmp_path / "orc"), partition_by="status"
    )
    assert back2.count() == 1


def test_bucketed_join_plans_without_exchange(spark):
    """Two tables bucketed+sorted on their join keys (same bucket
    count) join with ZERO Exchange operators — the pre-shuffled
    co-located join. A plain parquet join of the same data plans at
    least one shuffle, proving the assertion has teeth."""
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import bucketed_tables

    left = spark.range(2000).selectExpr("id AS k", "id % 7 AS a")
    right = spark.range(2000).selectExpr("id AS k2", "id % 5 AS b")
    bt = bucketed_tables(
        spark,
        {"t_bkt_left": left},
        key="k",
        buckets=4,
        prefix="test",
    )["t_bkt_left"]
    br = bucketed_tables(
        spark, {"t_bkt_right": right}, key="k2", buckets=4, prefix="test"
    )["t_bkt_right"]
    # the 100 TB regime: neither fact side fits the broadcast threshold
    # (at threshold, the planner rightly broadcasts and IGNORES buckets
    # — "Bucketed: false (disabled by query planner)")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bt.join(br, bt["k"] == br["k2"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 2000

        plain = left.join(right, left["k"] == right["k2"])
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_tables_gc_dead_pid_scratch(spark, tmp_path):
    """The PID-suffixed bucketed scratch of DEAD processes is GC'd on
    the next default-prefix build (without it a long-lived warehouse
    accumulates one table set per past run); live-process scratch and
    explicit prefixes are untouched."""
    import os
    import shutil
    from urllib.parse import urlparse

    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import bucketed_tables

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or spark.conf.get(
        "spark.sql.warehouse.dir"
    )
    dead = os.path.join(wh, "bkt_p999999_zombie")
    os.makedirs(dead, exist_ok=True)
    live_marker = os.path.join(wh, f"bkt_p{os.getpid()}_keepme")
    os.makedirs(live_marker, exist_ok=True)
    try:
        df = spark.createDataFrame([(1, "a")], ["k", "v"])
        out = bucketed_tables(spark, {"t_gc": df}, key="k", buckets=2)["t_gc"]
        assert out.count() == 1
        assert not os.path.exists(dead), "dead-pid scratch must be GC'd"
        assert os.path.exists(live_marker), "own-pid scratch must survive"
    finally:
        shutil.rmtree(live_marker, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS bkt_p{os.getpid()}_t_gc")
        shutil.rmtree(os.path.join(wh, f"bkt_p{os.getpid()}_t_gc"), ignore_errors=True)


def test_scratch_dir_is_per_process_and_gcs_dead_pids():
    import os
    import pathlib
    import tempfile

    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import scratch_dir

    root = tempfile.gettempdir()
    dead = os.path.join(root, "gcunit_tag_p999999")
    os.makedirs(dead, exist_ok=True)
    pathlib.Path(dead, "x").write_text("1")
    got = scratch_dir("gcunit tag")
    assert got.endswith(f"_p{os.getpid()}")
    assert not os.path.exists(dead)
