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


_texts = st.lists(
    st.text(alphabet="abc d", min_size=0, max_size=40), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_texts)
def test_repetition_fracs_bounded_and_consistent(spark, texts):
    """Repetition signals are well-formed on arbitrary text: fractions in
    [0, 1], top-gram share >= uniform share, zero grams -> zero fracs."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in repetition_stats(df, "text", n=2).collect():
        assert 0.0 <= r["dup_gram_frac"] <= 1.0
        assert 0.0 <= r["top_gram_frac"] <= 1.0
        if r["n_grams"] == 0:
            assert r["dup_gram_frac"] == 0.0 and r["top_gram_frac"] == 0.0
        else:
            # most frequent gram holds at least its uniform share
            # (fractions are rounded to 4dp -> up to 5e-5 * n slack)
            assert r["top_gram_frac"] * r["n_grams"] >= 1.0 - 1e-4 * r["n_grams"]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
    extra=st.lists(st.integers(min_value=10_001, max_value=20_000), min_size=0, max_size=10, unique=True),
)
def test_corpus_split_stable_under_growth(spark, ids, extra):
    """A document's train/val/test assignment never changes when new
    documents arrive (the seeded-hash split is a pure function of the
    id) — the reproducibility contract a growing corpus depends on."""
    from automated_datastore_discovery_with_aws_glue_spark.plans.llm_pipeline import _seeded_hash

    def assign(id_list):
        df = spark.createDataFrame([(i,) for i in id_list], ["doc_id"])
        bucket = _seeded_hash(F.col("doc_id"), "split") % 1000
        out = df.select(
            "doc_id",
            F.when(bucket < 900, "train").when(bucket < 950, "validation").otherwise("test").alias("split"),
        )
        return {r["doc_id"]: r["split"] for r in out.collect()}

    before = assign(ids)
    after = assign(ids + extra)
    assert all(after[i] == before[i] for i in ids)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=1,
        max_size=8,
    )
)
def test_int8_quantization_bounded_error(spark, vecs):
    """Symmetric int8 quantization round-trips within half a scale step
    per element (the quantizer's defining error bound), and all-zero
    vectors quantize exactly."""
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table  # noqa: F401

    df = spark.createDataFrame(list(enumerate(vecs)), ["vec_id", "embedding"])
    xs = F.transform("embedding", lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xs, F.abs))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    q = F.transform(
        xs,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int"))
        ),
    )
    rows = df.select("vec_id", xs.alias("v"), scale.alias("s"), q.alias("q")).collect()
    for r in rows:
        for x, qi in zip(r["v"], r["q"]):
            assert abs(qi * r["s"] - x) <= r["s"] / 2 + 1e-9, (x, qi, r["s"])


# ---------------------------------------------------------------------------
# Counts-merge invariance (file-level incremental classification)
# ---------------------------------------------------------------------------

_cells = st.one_of(
    st.just(None),
    st.just(""),
    st.from_regex(r"[0-9]{3}-[0-9]{2}-[0-9]{4}", fullmatch=True),  # dashed SSN
    st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.com", fullmatch=True),  # email
    st.text(alphabet="xyz 0123456789", min_size=0, max_size=20),  # noise
)
_rows = st.lists(st.tuples(_cells, _cells), min_size=1, max_size=24)
_splits = st.integers(min_value=1, max_value=4)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_rows, n_parts=_splits)
def test_classify_counts_merge_invariance(spark, rows, n_parts):
    """The invariant file-level incremental classification rests on: for
    ANY partition of the rows into subsets, summing per-subset match
    counts and deriving the classification equals classifying the whole
    frame in one pass — including threshold, context gate and the
    exact-sub-form escape."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.classify import (
        classification_from_counts,
        classify_columns,
        classify_columns_counts,
    )

    cols = ["ref_code", "contact_email"]  # one hinted, one not
    ent = ["USA_SSN", "EMAIL", "PHONE_NUMBER"]
    full = spark.createDataFrame(rows, f"{cols[0]} string, {cols[1]} string")

    parts = [rows[i::n_parts] for i in range(n_parts)]
    counts = None
    for i, chunk in enumerate(parts):
        if not chunk:
            continue
        c = classify_columns_counts(
            spark.createDataFrame(chunk, f"{cols[0]} string, {cols[1]} string"),
            ent,
            file_col=F.lit(f"part{i}"),
        )
        counts = c if counts is None else counts.unionByName(c)

    got = {
        r["columnName"]: list(r["entityTypes"])
        for r in classification_from_counts(counts, ent, 0.3, column_names=cols).collect()
    }
    want = {
        r["columnName"]: list(r["entityTypes"])
        for r in classify_columns(full, ent, 1.0, 0.3).collect()
    }
    assert got == want, (rows, n_parts)
