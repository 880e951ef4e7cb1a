"""Property-based tests (hypothesis) for algorithmic guarantees that
hand-picked examples can't pin down:

- Winnowing (Schleimer et al., SIGMOD'03) detection guarantee: two
  documents sharing a substring of length >= k + w - 1 in normalized
  form share at least one selected fingerprint.
- Gap sessionization is a partition of each user's events with gaps
  <= gap inside sessions and > gap between consecutive sessions.

Each example is one small Spark job; max_examples kept low.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_K, _W = 8, 4
_GUARANTEE = _K + _W - 1  # 11 chars

_words = st.text(alphabet="ab", min_size=1, max_size=6)
_context = st.lists(_words, min_size=0, max_size=8).map(" ".join)
_shared = st.text(alphabet="abcd", min_size=_GUARANTEE + 1, max_size=24)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pre_a=_context, post_a=_context, pre_b=_context, post_b=_context, shared=_shared)
def test_winnowing_detects_shared_substring(spark, pre_a, post_a, pre_b, post_b, shared):
    from automated_datastore_discovery_with_aws_glue_spark.operators.text import (
        winnow_fingerprints,
    )

    doc_a = f"{pre_a} {shared} {post_a}"
    doc_b = f"{pre_b} {shared} {post_b}"
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=_K, w=_W).alias("fp")
        ).collect()
    }
    assert rows[1] & rows[2], (doc_a, doc_b)


_ts_lists = st.lists(
    st.integers(min_value=0, max_value=500_000), min_size=1, max_size=30, unique=True
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=_ts_lists)
def test_sessionize_is_gap_partition(spark, ts):
    from automated_datastore_discovery_with_aws_glue_spark.streaming.sessionize import (
        sessionize_batch,
    )

    gap_minutes = 60
    gap_s = gap_minutes * 60
    df = (
        spark.createDataFrame([(t,) for t in ts], ["epoch"])
        .select(
            F.lit(1).alias("user_id"),
            F.timestamp_seconds(F.col("epoch")).alias("ts"),
            F.col("epoch").alias("event_id"),
        )
    )
    sessions = sessionize_batch(df, gap_minutes=gap_minutes).collect()
    # partition: every event in exactly one session, counts add up
    assert sum(r["n_events"] for r in sessions) == len(ts)
    ordered = sorted(ts)
    bounds = sorted((r["session_start"], r["session_end"], r["n_events"]) for r in sessions)
    prev_end = None
    i = 0
    for start, end, n in bounds:
        chunk = ordered[i : i + n]
        i += n
        # intra-session: consecutive gaps <= gap
        assert all(b - a <= gap_s for a, b in zip(chunk, chunk[1:]))
        # session bounds are the chunk's min/max
        assert chunk[0] == _to_epoch(start) and chunk[-1] == _to_epoch(end)
        # inter-session: gap strictly greater
        if prev_end is not None:
            assert chunk[0] - prev_end > gap_s
        prev_end = chunk[-1]


def _to_epoch(s: str) -> int:
    from datetime import datetime, timezone

    return int(datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc).timestamp())
