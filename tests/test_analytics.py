"""Semantic edge-case tests for the behavioral / record-linkage plans
(`plans/analytics.py`) on ENGINEERED micro-fixtures — the sf0.01 oracle
run proves engine-vs-DuckDB equality; these prove the semantics are the
ones a product-analytics user expects (window cutoffs, step ordering,
cohort offsets, blocking tradeoffs)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.plans import analytics as A

T0 = dt.datetime(2024, 3, 4, 12, 0, 0)  # a Monday noon


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, user_id, event_type, ts_offset_hours)."""
    data = [
        (eid, T0 + dt.timedelta(hours=h), uid, et, 1.0, "{}")
        for eid, uid, et, h in rows
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(d + "/events.parquet")
    return d


def test_funnel_window_and_ordering(spark, tmp_path):
    """The funnel counts a user at step k only if the step-k event falls
    AT OR AFTER the user's step-(k-1) time and within 7 days of the
    user's FIRST step-1 event — boundary inclusive, order strict."""
    H = 24
    rows = [
        # A: view -> click -> purchase, all in window  => all 3 steps
        (1, 1, "view", 0), (2, 1, "click", 1 * H), (3, 1, "purchase", 2 * H),
        # B: click BEFORE the first view, none after   => step 1 only
        (4, 2, "click", -1), (5, 2, "view", 0),
        # C: purchase BETWEEN view and click           => steps 1-2 only
        (6, 3, "view", 0), (7, 3, "purchase", 1 * H), (8, 3, "click", 2 * H),
        # D: click 8 days after the first view         => step 1 only
        (9, 4, "view", 0), (10, 4, "click", 8 * H),
        # E: purchase exactly AT the 7-day deadline    => all 3 (inclusive)
        (11, 5, "view", 0), (12, 5, "click", 1 * H), (13, 5, "purchase", 7 * H),
        # F: click with NO view at all                 => no steps
        (14, 6, "click", 0),
        # D's second view doesn't reset the window (t1 is the FIRST view)
        (15, 4, "view", 2 * H),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {r["step_idx"]: r for r in A.ev_funnel(spark, d).collect()}
    assert [got[i]["users"] for i in (1, 2, 3)] == [5, 3, 2]
    assert got[1]["pct_of_first"] == 1.0
    assert got[2]["pct_of_first"] == 0.6
    assert got[3]["pct_of_first"] == 0.4
    assert [got[i]["step_name"] for i in (1, 2, 3)] == ["view", "click", "purchase"]


def test_cohort_retention_offsets_and_rates(spark, tmp_path):
    """Cohort = Monday-truncated week of a user's FIRST event; each
    later-week activity lands at the right integer offset and the rate
    divides by that cohort's size (not the global user count)."""
    W = 7 * 24
    rows = [
        # cohort week 0: users 1, 2
        (1, 1, "view", 0),           # u1 active week 0
        (2, 1, "click", 1 * W),      # u1 active week 1
        (3, 1, "view", 3 * W),       # u1 active week 3
        (4, 2, "view", 1),           # u2 active week 0 only
        (5, 2, "view", 2),           # same week — no double count
        # cohort week 1: user 3 (first event is in week 1)
        (6, 3, "purchase", 1 * W), (7, 3, "view", 2 * W),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {
        (r["cohort_week"], r["week_offset"]): (r["active_users"], r["cohort_size"], r["retention_rate"])
        for r in A.ev_cohort_retention(spark, d).collect()
    }
    w0 = T0.date() - dt.timedelta(days=T0.weekday())
    w1 = w0 + dt.timedelta(days=7)
    assert out[(str(w0), 0)] == (2, 2, 1.0)
    assert out[(str(w0), 1)] == (1, 2, 0.5)
    assert out[(str(w0), 3)] == (1, 2, 0.5)
    assert (str(w0), 2) not in out          # nobody active in week 2
    assert out[(str(w1), 0)] == (1, 1, 1.0)
    assert out[(str(w1), 1)] == (1, 1, 1.0)
    assert len(out) == 5


def _write_parts(spark, tmp_path, rows):
    """rows: (p_partkey, p_name, p_brand)."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string"
    ).coalesce(1).write.parquet(d + "/part.parquet")
    return d


def test_er_sorted_neighborhood_blocking_semantics(spark, tmp_path):
    """Sorted-neighborhood ER: near-identical entities in the same
    4-char block pair up; the %7 truncation is applied; pairs are
    bounded by the neighbor window; cross-block near-dups are NOT
    compared (the documented blocking tradeoff)."""
    rows = [
        # three identical entities; key 14 (%7==0) gets last-char truncation
        (1, "alpha widget", "B1"),
        (2, "alpha widget", "B1"),
        (14, "alpha widget", "B1"),
        # same block, dist 3 from the others -> candidate but filtered
        (3, "alphXXXidget", "B1"),
        # cross-block near-dup of "alpha widget" (block 'Alph' != 'alph')
        (4, "Alpha widget", "B1"),
        # 8 identical entities (keys chosen to dodge the %7 rule):
        # pairs limited to the 5-neighbor window
        *[(k, "charlie gadget", "B9") for k in (50, 51, 52, 53, 55, 57, 58, 59)],
    ]
    d = _write_parts(spark, tmp_path, rows)
    out = A.er_sorted_neighborhood(spark, d).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out}

    # the truncated key 14 ("alpha widget B" after %7 rule) sorts first
    # in block 'alph' and pairs with both full entities at dist 1
    assert pairs[(14, 1)] == 1 and pairs[(14, 2)] == 1
    assert pairs[(1, 2)] == 0
    # dist-3 entity produced no surviving pair
    assert not any(3 in p for p in pairs)
    # cross-block near-dup is never compared
    assert not any(4 in p for p in pairs)
    # 8 identical rows sorted by key, window 5: pair kept iff the two
    # positions are <= 5 apart
    charlie = [(a, b) for (a, b) in pairs if a >= 50]
    assert len(charlie) == sum(min(5, 7 - i) for i in range(8))
    assert (50, 57) in pairs and (50, 58) not in pairs


def test_er_candidate_join_is_equi_join(spark):
    """The neighbor comparison must plan as a pure equi-join (hash or
    sort-merge on (block, rn)) — no broadcast nested loop, no cartesian
    — that's the O(rows x window) scale contract."""
    from tests.conftest import SF_DIR

    df = A.er_sorted_neighborhood(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_er_clusters_transitive_and_survivorship(spark, tmp_path):
    """Connected components over the SN pair graph: A~B and B~C put
    A,B,C in ONE cluster even when A-C alone exceeds the distance gate
    (transitivity), the canonical entity is the min-key member's, and
    unpaired records are size-1 clusters labeling themselves."""
    rows = [
        (1, "alpha aaaa", "Z"),   # pairs with 2 (dist 2)
        (2, "alpha aabb", "Z"),   # pairs with 1 AND 3
        (3, "alpha bbbb", "Z"),   # dist 4 from 1 — no direct pair
        (9, "omega unique", "Z"),
    ]
    d = _write_parts(spark, tmp_path, rows)
    out = {r["p_partkey"]: r for r in A.er_clusters(spark, d).collect()}
    assert len(out) == 4
    for k in (1, 2, 3):
        assert out[k]["cluster_id"] == 1
        assert out[k]["cluster_size"] == 3
        assert out[k]["canonical_entity"] == "alpha aaaa Z"
    assert out[9]["cluster_id"] == 9
    assert out[9]["cluster_size"] == 1
    assert out[9]["canonical_entity"] == "omega unique Z"


def test_cat_schema_drift_change_classes(spark):
    """The drift report over the real tables: every table contributes
    exactly one removed legacy column; added rows have no previous
    type; type_changed rows differ on both sides; unchanged columns
    never leak into the report."""
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import TESTDATA_TABLES
    from tests.conftest import SF_DIR

    rows = A.cat_schema_drift(spark, SF_DIR).collect()
    by_change: dict = {}
    for r in rows:
        by_change.setdefault(r["change"], []).append(r)
    assert set(by_change) == {"added", "removed", "type_changed"}
    removed = by_change["removed"]
    assert len(removed) == len(TESTDATA_TABLES)
    assert {r["column_name"] for r in removed} == {
        f"{t}_legacy_id" for t in TESTDATA_TABLES
    }
    for r in by_change["added"]:
        assert r["prev_type"] is None and r["curr_type"] is not None
    for r in by_change["type_changed"]:
        assert r["prev_type"] is not None and r["curr_type"] is not None
        assert r["prev_type"] != r["curr_type"]


def test_colloc_lift_exact_on_engineered_corpus(spark, tmp_path):
    """Exact lift arithmetic: 10 copies of 'a b c d' give every
    adjacent bigram c12=10, c1=c2=10, N_tokens=40, N_bigrams=30 ->
    lift = 10*40/10/10*40/30 = 5.3333; non-adjacent words never pair."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, "a b c d") for i in range(10)], ["doc_id", "text"]
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    rows = A.colloc_lift(spark, d).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("a", "b"), ("b", "c"), ("c", "d")}
    for r in got.values():
        assert (r["c12"], r["c1"], r["c2"]) == (10, 10, 10)
        assert r["lift"] == 5.3333


def test_ev_anomaly_zscore_flags_spike_not_baseline(spark, tmp_path):
    """26 hourly buckets of steady value 10.00 then one 500.00 spike:
    the spike is flagged (|z| > 3 vs the trailing 24), the steady tail
    is not, and the first 12 buckets (warm-up) emit no rows at all.
    A zero-variance trailing window flags ANY deviation (z NULL)."""
    H = 1
    rows = []
    eid = 0
    for h in range(26):
        eid += 1
        rows.append((eid, "buy", h * H, 10.0 + (h % 2) * 0.02))  # tiny wiggle
    eid += 1
    rows.append((eid, "buy", 26 * H, 500.0))  # the spike
    for h in range(27, 30):
        eid += 1
        rows.append((eid, "buy", h * H, 10.0))
    # a second type with CONSTANT values: zero variance -> deviation flags
    for h in range(14):
        eid += 1
        rows.append((eid, "flat", h * H, 7.0))
    eid += 1
    rows.append((eid, "flat", 14 * H, 7.5))
    data = [
        (e, T0 + dt.timedelta(hours=h), 1, et, v, "{}")
        for e, et, h, v in rows
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    out = A.ev_anomaly_zscore(spark, d).collect()
    buy = [r for r in out if r["event_type"] == "buy"]
    assert min(r["bucket_start_epoch"] for r in buy) >= int(
        (T0 + dt.timedelta(hours=12)).timestamp()
    )
    spikes = [r for r in buy if r["is_anomaly"]]
    assert [r["total_value"] for r in spikes] == [500.0]
    assert spikes[0]["zscore"] > 3
    flat = [r for r in out if r["event_type"] == "flat"]
    anomalous_flat = [r for r in flat if r["is_anomaly"]]
    assert [r["total_value"] for r in anomalous_flat] == [7.5]
    assert anomalous_flat[0]["zscore"] is None  # zero-variance window


def test_ev_top_paths_order_tiebreak_and_gap(spark, tmp_path):
    """Trigram paths read consecutive events in (ts, event_id) order;
    same-ts events break ties on event_id; a trigram whose 1st->3rd
    span exceeds 2 hours is excluded."""
    H = 1
    rows = [
        # user 1: a>b>c (tight), then b>c>d with c->d 3h later (span ok:
        # b..d = 3h+2m > 2h -> EXCLUDED)
        (1, 1, "a", 0.00), (2, 1, "b", 0.01), (3, 1, "c", 0.02),
        (4, 1, "d", 3 * H + 0.02),
        # user 2: same-ts tie: event_id orders x before y
        (10, 2, "w", 0.0), (11, 2, "x", 0.5), (12, 2, "y", 0.5),
    ]
    data = [
        (e, T0 + dt.timedelta(hours=h), u, et, 1.0, "{}")
        for e, u, et, h in rows
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    got = {r["path"]: r["n"] for r in A.ev_top_paths(spark, d).collect()}
    assert got == {"a>b>c": 1, "w>x>y": 1}


def test_ev_attribution_models_and_remainder(spark, tmp_path):
    """One purchase of $1.00 with 3 touches: linear splits 33/33/34
    cents (remainder to the LAST touch — cents always sum exactly);
    first/last models credit the boundary touches in full; an
    out-of-window touch is invisible; a touchless purchase lands on
    (direct)."""
    H = 24
    rows = [
        # user 1: view(old, outside 7d) view click -> purchase $1.00
        (1, 1, "view", -8 * H, 1.0),
        (2, 1, "view", -2 * H, 1.0),
        (3, 1, "view", -1 * H, 1.0),
        (4, 1, "click", -1, 1.0),
        (5, 1, "purchase", 0, 1.00),
        # user 2: no touches -> (direct) $2.50
        (6, 2, "purchase", 0, 2.50),
    ]
    data = [
        (e, T0 + dt.timedelta(hours=h), u, et, v, "{}")
        for e, u, et, h, v in rows
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    got = {
        r["channel"]: (r["n_rows"], r["linear_usd"], r["first_usd"], r["last_usd"])
        for r in A.ev_attribution(spark, d).collect()
    }
    # 3 in-window touches (events 2,3 view + 4 click); event 1 excluded.
    # linear: 100 div 3 = 33 each, last (click, event 4) gets 33+1=34
    assert got["view"] == (2, 0.66, 1.0, 0.0)   # first touch = event 2 (view)
    assert got["click"] == (1, 0.34, 0.0, 1.0)  # last touch = event 4
    assert got["(direct)"] == (1, 2.5, 2.5, 2.5)
    total_linear = round(sum(v[1] for v in got.values()), 2)
    assert total_linear == 3.5  # cents conserved exactly
