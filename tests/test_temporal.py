"""Temporal join operators (operators/temporal.py): as-of join edge
semantics and range-join bin-boundary correctness."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import asof_join, range_join_count


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    """Equal-ts match, strictly-later right rows invisible, no-match
    NULLs, per-key isolation, and the tolerance cutoff."""
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # equal-ts update matches
            (2, "k1", _ts("2024-01-01 10:04:59")),  # latest <= wins
            (3, "k1", _ts("2024-01-01 09:00:00")),  # before any update
            (4, "k2", _ts("2024-01-01 11:00:00")),  # other key's updates invisible
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 10:00:00"), 1.0),
            ("k1", _ts("2024-01-01 10:03:00"), 2.0),
            ("k1", _ts("2024-01-01 10:05:00"), 3.0),  # later than any left
        ],
        ["k", "ts", "v"],
    )
    got = {r["id"]: (r["v"], r["ts_r"]) for r in asof_join(left, right, "k").collect()}
    assert got[1] == (1.0, _ts("2024-01-01 10:00:00"))
    assert got[2] == (2.0, _ts("2024-01-01 10:03:00"))
    assert got[3] == (None, None)
    assert got[4] == (None, None)

    # tolerance: a match older than 60s is discarded (NULL, not dropped)
    tol = {
        r["id"]: r["v"]
        for r in asof_join(left, right, "k", tolerance_us=60_000_000).collect()
    }
    assert tol[1] == 1.0  # 0s old
    assert tol[2] is None  # 119s old -> outside tolerance
    assert len(tol) == 4  # left-join row count preserved


def test_asof_join_equal_ts_right_ties_deterministic(spark):
    """Two right rows sharing (key, ts): the greatest payload struct
    wins, identically on every run."""
    left = spark.createDataFrame([(1, "k", _ts("2024-01-01 10:00:01"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 5.0), ("k", _ts("2024-01-01 10:00:00"), 9.0)],
        ["k", "ts", "v"],
    )
    for _ in range(3):
        assert asof_join(left, right, "k").collect()[0]["v"] == 9.0


def test_range_join_count_bin_boundaries(spark):
    """Counts are exact across bin boundaries: a partner delta-1 later
    in the NEXT bin is found (the bin±1 candidate rule), a partner
    exactly at delta counts (inclusive), delta+1 does not, and
    same-instant rows don't count (strictly after)."""
    delta = 10_000_000  # 10s
    rows = [
        (1, "k", _ts("2024-01-01 10:00:09")),   # partner: id2 (+2s, in the NEXT bin)
        (2, "k", _ts("2024-01-01 10:00:11")),   # partner: id3 (+10s EXACTLY, inclusive)
        (3, "k", _ts("2024-01-01 10:00:21")),   # id4/5 are +11s -> outside
        (4, "k", _ts("2024-01-01 10:00:32")),   # nothing after
        (5, "k", _ts("2024-01-01 10:00:32")),   # same instant as 4: strictly-after excludes
        (6, "x", _ts("2024-01-01 10:00:10")),   # other key isolated
    ]
    df = spark.createDataFrame(rows, ["id", "k", "ts"])
    got = {
        r["id"]: r["n_in_range"]
        for r in range_join_count(df, df, "k", delta_us=delta).collect()
    }
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0}


def test_range_join_count_matches_naive(spark):
    """The bin-bucketed count equals the naive all-pairs filter on a
    randomized fixture — boundary-heavy timestamps included."""
    import random

    rng = random.Random(11)
    delta = 7_000_000
    base = _ts("2024-01-01 00:00:00")
    from datetime import timedelta

    rows = [
        (i, f"k{rng.randrange(3)}", base + timedelta(microseconds=rng.randrange(0, 60_000_000, 1_000_000)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["id", "k", "ts"])
    got = {
        r["id"]: r["n_in_range"]
        for r in range_join_count(df, df, "k", delta_us=delta).collect()
    }
    naive = (
        df.alias("a")
        .join(df.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(
            (F.col("b.ts") > F.col("a.ts"))
            & (F.unix_micros("b.ts") - F.unix_micros("a.ts") <= delta)
        )
        .groupBy(F.col("a.id").alias("id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["id"]: r["n"] for r in naive.collect()}
    for i in range(120):
        assert got[i] == want.get(i, 0), i


def test_range_join_count_preserves_duplicate_rows(spark):
    """Duplicate df_a rows (no unique id column) must come back as
    duplicates, each with ITS OWN count — never collapsed/summed
    (regression: the first formulation grouped on the full-row struct,
    merging identical rows and inflating their counts)."""
    rows = [
        (None, "k", _ts("2024-01-01 10:00:00")),
        (None, "k", _ts("2024-01-01 10:00:00")),  # bit-identical duplicate
        (None, "k", _ts("2024-01-01 10:00:03")),
    ]
    df = spark.createDataFrame(rows, "junk string, k string, ts timestamp").drop("junk")
    out = range_join_count(df, df, "k", delta_us=10_000_000).collect()
    assert len(out) == 3  # duplicates preserved
    counts = sorted(r["n_in_range"] for r in out)
    # each 10:00:00 row sees ONE partner (the 10:00:03 row; the twin is
    # same-instant, strictly-after excludes it); the 10:00:03 row sees 0
    assert counts == [0, 1, 1]


def test_asof_join_plans_one_shuffle(spark):
    """The formulation's reason to exist: the whole as-of join plans as
    ONE exchange (the key hash-partitioning feeding the window) plus
    the union — no join node, no pair materialization, regardless of
    key skew."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 09:00:00"), 1.0)], ["k", "ts", "v"]
    )
    out = asof_join(left, right, "k")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    assert "hashpartitioning(k#" in plan  # the one shuffle IS the key partitioning
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, (node, plan)
    assert "Window" in plan and "Union" in plan


def test_asof_join_forward(spark):
    """Forward direction: earliest right at-or-after; equal-ts matches;
    earlier-only rights invisible; tolerance cuts far-future matches."""
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # equal-ts update matches
            (2, "k1", _ts("2024-01-01 10:01:00")),  # earliest >= wins (10:03)
            (3, "k1", _ts("2024-01-01 10:06:00")),  # after all updates -> NULL
            (4, "k2", _ts("2024-01-01 09:00:00")),  # other key isolated
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 10:00:00"), 1.0),
            ("k1", _ts("2024-01-01 10:03:00"), 2.0),
            ("k1", _ts("2024-01-01 10:05:00"), 3.0),
        ],
        ["k", "ts", "v"],
    )
    got = {
        r["id"]: (r["v"], r["ts_r"])
        for r in asof_join(left, right, "k", direction="forward").collect()
    }
    assert got[1] == (1.0, _ts("2024-01-01 10:00:00"))
    assert got[2] == (2.0, _ts("2024-01-01 10:03:00"))
    assert got[3] == (None, None)
    assert got[4] == (None, None)

    tol = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, "k", direction="forward", tolerance_us=60_000_000
        ).collect()
    }
    assert tol[1] == 1.0  # 0s ahead
    assert tol[2] is None  # 120s ahead -> outside tolerance
    assert len(tol) == 4


def test_asof_join_forward_equal_ts_ties_deterministic(spark):
    """Forward tie rule mirrors a LATERAL ORDER BY ts, payload LIMIT 1:
    the SMALLEST payload struct wins among same-ts rights."""
    left = spark.createDataFrame([(1, "k", _ts("2024-01-01 09:59:59"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 5.0), ("k", _ts("2024-01-01 10:00:00"), 9.0)],
        ["k", "ts", "v"],
    )
    for _ in range(3):
        assert asof_join(left, right, "k", direction="forward").collect()[0]["v"] == 5.0


def test_asof_join_nearest(spark):
    """Nearest picks the closer side; equidistant resolves backward;
    one-sided availability falls back to the available side; tolerance
    applies per-side BEFORE the distance compare."""
    left = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01 10:00:10")),  # back 10s vs fwd 50s -> back
            (2, "k", _ts("2024-01-01 10:00:50")),  # back 50s vs fwd 10s -> fwd
            (3, "k", _ts("2024-01-01 10:00:30")),  # equidistant 30s -> backward
            (4, "k", _ts("2024-01-01 09:00:00")),  # only forward exists
            (5, "k", _ts("2024-01-01 12:00:00")),  # only backward exists
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 1.0), ("k", _ts("2024-01-01 10:01:00"), 2.0)],
        ["k", "ts", "v"],
    )
    got = {
        r["id"]: r["v"]
        for r in asof_join(left, right, "k", direction="nearest").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 1.0, 4: 1.0, 5: 2.0}

    # tolerance 30s: row 4's forward match is 3600s away -> NULL; row 3
    # keeps its exactly-30s backward match (inclusive bound)
    tol = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, "k", direction="nearest", tolerance_us=30_000_000
        ).collect()
    }
    assert tol == {1: 1.0, 2: 2.0, 3: 1.0, 4: None, 5: None}


def test_asof_join_nearest_plans_one_shuffle(spark):
    """nearest adds a second sort pass but must NOT add a second
    exchange: both window directions ride the same key partitioning."""
    left = spark.createDataFrame([(1, "k", _ts("2024-01-01 10:00:00"))], ["id", "k", "ts"])
    right = spark.createDataFrame([("k", _ts("2024-01-01 09:00:00"), 1.0)], ["k", "ts", "v"])
    out = asof_join(left, right, "k", direction="nearest")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, (node, plan)


def test_range_join_pairs_match_naive(spark):
    """Pair emission equals the naive all-pairs filter (exactly-once per
    qualifying pair, boundary timestamps included) on a randomized
    fixture."""
    import random
    from datetime import timedelta

    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import range_join

    rng = random.Random(7)
    delta = 7_000_000
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (i, f"k{rng.randrange(3)}", base + timedelta(microseconds=rng.randrange(0, 60_000_000, 1_000_000)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["id", "k", "ts"])
    got = sorted(
        (r["id"], r["id_b"]) for r in range_join(df, df, "k", delta_us=delta).collect()
    )
    naive = (
        df.alias("a")
        .join(df.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(
            (F.col("b.ts") > F.col("a.ts"))
            & (F.unix_micros("b.ts") - F.unix_micros("a.ts") <= delta)
        )
        .select(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
    )
    want = sorted((r["x"], r["y"]) for r in naive.collect())
    assert got == want
    assert len(got) == len(set(got))  # exactly-once, no bin double-count


def test_range_join_pair_boundaries(spark):
    """Exactly-at-delta pairs emit (inclusive), delta+1 and same-instant
    do not, cross-bin partners are found, payload columns suffix."""
    delta = 10_000_000
    rows = [
        (1, "k", _ts("2024-01-01 10:00:09")),
        (2, "k", _ts("2024-01-01 10:00:11")),   # +2s from id1, next bin
        (3, "k", _ts("2024-01-01 10:00:21")),   # +10s EXACTLY from id2
        (4, "k", _ts("2024-01-01 10:00:32")),   # +11s from id3 -> out
        (5, "k", _ts("2024-01-01 10:00:32")),   # same instant as 4 -> out
    ]
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import range_join

    df = spark.createDataFrame(rows, ["id", "k", "ts"])
    out = range_join(df, df, "k", delta_us=delta)
    assert {"id", "k", "ts", "id_b", "ts_b"} == set(out.columns)
    pairs = sorted((r["id"], r["id_b"]) for r in out.collect())
    assert pairs == [(1, 2), (2, 3)]


def test_salted_join_matches_plain_join_all_shapes(spark):
    """Salting must never change the result set: inner / left /
    left_semi / left_anti all equal their plain twins, duplicates and
    unmatched keys included; reserved/colliding columns raise."""
    import pytest as _pytest

    from automated_datastore_discovery_with_aws_glue_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "hot"), (2, "hot"), (3, "hot"), (3, "hot"), (4, "cold"), (5, "orphan")],
        ["id", "k"],
    )
    right = spark.createDataFrame(
        [("hot", 10), ("hot", 11), ("cold", 20), ("unused", 30)], ["k", "v"]
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(map(tuple, salted_join(left, right, "k", n_salt=4, how=how).collect()))
        want = sorted(map(tuple, left.join(right, "k", how).collect()))
        assert got == want, how

    with _pytest.raises(ValueError, match="probe-preserving"):
        salted_join(left, right, "k", how="right")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(left.withColumn("_salt", F.lit(1)), right, "k")
    with _pytest.raises(ValueError, match="non-key"):
        salted_join(left.withColumn("v", F.lit(1)), right, "k")


def test_salted_join_widens_the_shuffle_key(spark):
    """The operator's reason to exist: the exchange partitions on
    (key, _salt), so one hot key spreads across n_salt partitions.
    Broadcast is disabled for the probe so the shuffle is visible."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.skew import salted_join

    left = spark.createDataFrame([(i, "hot") for i in range(100)], ["id", "k"])
    right = spark.createDataFrame([("hot", 1)], ["k", "v"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = salted_join(left, right, "k", n_salt=8)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re

    # BOTH sides exchange on (key, salt): the hot key spreads over
    # n_salt shuffle partitions (AQE may later coalesce tiny test data,
    # so the partitioning expression — not a runtime partition count —
    # is the property to pin)
    assert len(re.findall(r"hashpartitioning\(k#\d+, _salt#\d+", plan)) == 2, plan
    got = sorted(map(tuple, out.collect()))  # key-first column order
    assert got == sorted(("hot", i, 1) for i in range(100))


def test_asof_join_composite_key(spark):
    """Multi-column keys: matches respect BOTH key columns (the
    (symbol, venue) shape), in every direction, still one shuffle."""
    left = spark.createDataFrame(
        [
            (1, "aapl", "N", _ts("2024-01-01 10:00:30")),
            (2, "aapl", "Q", _ts("2024-01-01 10:00:30")),
            (3, "msft", "N", _ts("2024-01-01 10:00:30")),
        ],
        ["id", "sym", "venue", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("aapl", "N", _ts("2024-01-01 10:00:00"), 1.0),
            ("aapl", "Q", _ts("2024-01-01 10:00:10"), 2.0),
            ("msft", "N", _ts("2024-01-01 10:01:00"), 3.0),
        ],
        ["sym", "venue", "ts", "px"],
    )
    back = {
        r["id"]: r["px"]
        for r in asof_join(left, right, ["sym", "venue"]).collect()
    }
    assert back == {1: 1.0, 2: 2.0, 3: None}
    near = {
        r["id"]: r["px"]
        for r in asof_join(left, right, ["sym", "venue"], direction="nearest").collect()
    }
    assert near == {1: 1.0, 2: 2.0, 3: 3.0}

    out = asof_join(left, right, ["sym", "venue"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "hashpartitioning(sym#" in plan and "venue#" in plan


def test_gapfill_locf_interp_and_edges(spark):
    """One user, hourly buckets 0/3 observed (10.0, 40.0), bucket 5
    observed (100.0): gaps 1-2 interpolate linearly on the 0-3 segment,
    gap 4 on the 3-5 segment; LOCF carries the last observation; edges
    outside the observed span never appear (grid = [first, last])."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import gapfill

    rows = [
        (1, 7, _ts("2024-01-01 00:10:00"), 10.0),
        (2, 7, _ts("2024-01-01 03:20:00"), 40.0),
        (3, 7, _ts("2024-01-01 05:59:00"), 100.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        r["bucket_start_epoch"]: (r["observed"], r["value"], r["locf"], r["interp"])
        for r in gapfill(df, "user_id", order_col="event_id").collect()
    }
    h = 3600
    b0 = int(_ts("2024-01-01 00:00:00").timestamp()) // h * h
    assert len(out) == 6
    assert out[b0] == (True, 10.0, 10.0, 10.0)
    assert out[b0 + h] == (False, None, 10.0, 20.0)
    assert out[b0 + 2 * h] == (False, None, 10.0, 30.0)
    assert out[b0 + 3 * h] == (True, 40.0, 40.0, 40.0)
    assert out[b0 + 4 * h] == (False, None, 40.0, 70.0)
    assert out[b0 + 5 * h] == (True, 100.0, 100.0, 100.0)


def test_gapfill_first_by_ts_tiebreak_and_leading_gap(spark):
    """Two observations in one bucket keep the FIRST by (ts, order);
    buckets before the first observation LOCF/interp to NULL (the user
    joined mid-grid case is per-key — another key's span is invisible)."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import gapfill

    rows = [
        (2, 7, _ts("2024-01-01 00:30:00"), 99.0),   # same bucket, later ts
        (1, 7, _ts("2024-01-01 00:10:00"), 10.0),   # kept (earlier ts)
        (3, 7, _ts("2024-01-01 02:10:00"), 30.0),
        (9, 8, _ts("2024-01-05 00:05:00"), 1.0),    # other key, one bucket
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    res = gapfill(df, "user_id", order_col="event_id").collect()
    u7 = sorted(
        [r for r in res if r["user_id"] == 7], key=lambda r: r["bucket_start_epoch"]
    )
    assert [r["value"] for r in u7] == [10.0, None, 30.0]
    assert [r["interp"] for r in u7] == [10.0, 20.0, 30.0]
    u8 = [r for r in res if r["user_id"] == 8]
    assert len(u8) == 1 and u8[0]["observed"] and u8[0]["value"] == 1.0


def test_gapfill_quarter_unit_interpolation_is_half_up(spark):
    """A gap of 4 between 0.01 and 0.02 yields quarter-cent steps —
    the exact-tie case float round() gets wrong across engines; the
    integer path rounds half-up deterministically: 0.0125 -> 0.0125
    (exact 4dp), 1/3-cent steps -> half-up at the 5th decimal."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import gapfill

    rows = [
        (1, 7, _ts("2024-01-01 00:00:00"), 0.01),
        (2, 7, _ts("2024-01-01 02:00:00"), 0.02),  # gap of 1: interp 0.015
        (3, 7, _ts("2024-01-01 05:00:00"), 0.03),  # gap of 2: thirds of a cent
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        r["bucket_start_epoch"]: r["interp"]
        for r in gapfill(df, "user_id", order_col="event_id").collect()
    }
    h = 3600
    b0 = min(out)
    assert out[b0 + h] == 0.015
    # 2 + 1/3 cents = 0.023333... -> 0.0233; 2 + 2/3 -> 0.026666... -> 0.0267
    assert out[b0 + 3 * h] == 0.0233
    assert out[b0 + 4 * h] == 0.0267


def test_range_join_rejects_key_as_timestamp(spark):
    """b_ts/a_ts colliding with the equality key must fail with a
    descriptive ValueError up front (it used to surface as a bare
    KeyError from the internal rename map)."""
    import pytest

    from automated_datastore_discovery_with_aws_glue_spark.operators.temporal import range_join

    a = spark.createDataFrame([("k1", _ts("2024-01-01 10:00:00"))], ["k", "ts"])
    b = spark.createDataFrame([("k1", _ts("2024-01-01 10:01:00"))], ["k", "ts"])
    with pytest.raises(ValueError, match="join key"):
        range_join(a, b, "k", b_ts="k")
    with pytest.raises(ValueError, match="join key"):
        range_join(a, b, "k", a_ts="k")
    with pytest.raises(ValueError, match="not in df_b"):
        range_join(a, b, "k", b_ts="nope")
