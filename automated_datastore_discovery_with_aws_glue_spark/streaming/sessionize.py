"""Gap-based sessionization — the custom stateful operator surface
(SURVEY §2.9 St5 beyond-parity; the training-data-pipeline shape for
user/session grouping of event logs).

Two formulations with identical semantics:

- :func:`sessionize_batch` — pure DataFrame (lag -> gap flag -> running
  sum -> group), oracle-checkable in DuckDB (`sess_gap_split`). One
  window shuffle on the session key; the aggregate reuses the same
  partitioning, so the whole operator is a single exchange.
- :func:`sessionize_stream` — ``applyInPandasWithState`` over a grouped
  stream: per-key state carries the open session ``(start, last, n)``
  across micro-batches AND restarts (checkpointed); closed sessions emit
  as soon as the gap is observed. This is the Arrow-batched stateful
  path Spark reserves for semantics its built-in windowed aggregates
  can't express (data-driven session boundaries, not fixed windows).

Scale: state is O(active keys) x 3 longs; each micro-batch shuffles on
the group key only. The batch twin is the backfill path over history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_STATE_SCHEMA = "start long, last long, n long"  # epoch micros + count


def _out_schema(events: DataFrame, key_col: str):
    """Output schema with the key column's ACTUAL type (a hardcoded
    bigint key would fail Arrow conversion for string/other keys)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("user_id", events.schema[key_col].dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )


def _to_micros(ts: pd.Series) -> pd.Series:
    return pd.to_datetime(ts).astype("datetime64[us]").astype("int64")


def _make_session_fn(gap_us: int):
    def fn(key: Any, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # watermark passed last+gap with no further events for this
            # key: the open session is definitively closed — flush it.
            if last is not None:
                closed.append((start, last, n))
            state.remove()
        else:
            # consecutive before-session stragglers accumulate into ONE
            # pending early session (batch-twin parity: two late events
            # within gap of each other merge, not two singletons); closed
            # when the next straggler is > gap after it or at batch end
            pend: tuple[int, int, int] | None = None
            chunks = [pdf["ts"] for pdf in pdf_iter]
            if chunks:
                for t in _to_micros(pd.concat(chunks)).sort_values():
                    t = int(t)
                    if last is None:
                        start, last, n = t, t, 1
                    elif t - last > gap_us:
                        closed.append((start, last, n))
                        start, last, n = t, t, 1
                    elif t < start - gap_us:
                        # a late event more than gap BEFORE the open
                        # session (cross-batch, within the watermark):
                        # it can't join it — grow the pending early
                        # session (events arrive here time-sorted, so
                        # t >= pend.last whenever pend exists)
                        if pend is not None and t - pend[1] <= gap_us:
                            pend = (pend[0], t, pend[2] + 1)
                        else:
                            if pend is not None:
                                closed.append(pend)
                            pend = (t, t, 1)
                    else:
                        # in-session event, possibly LATE (cross-batch
                        # arrival older than `last` but within the
                        # watermark): bounds must only ever widen — a
                        # plain `last = t` would regress session_end and
                        # the idle-flush horizon
                        start, last, n = min(start, t), max(last, t), n + 1
                        if pend is not None and start - pend[1] <= gap_us:
                            # widening `start` brought the open session
                            # within gap of the pending stragglers:
                            # absorb them (batch-twin semantics)
                            start, n = min(start, pend[0]), n + pend[2]
                            pend = None
            if pend is not None:
                closed.append(pend)
            if last is not None:
                state.update((int(start), int(last), int(n)))
                # schedule the idle flush: fires once the event-time
                # watermark passes the session's gap horizon (epoch ms)
                state.setTimeoutTimestamp((int(last) + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: emits each CLOSED session exactly once;
    the open session per key lives in checkpointed group state across
    micro-batches and restarts. Sessions close two ways: a later event
    past the gap (data-driven), or the event-time watermark passing
    ``last + gap`` with no further events (idle flush via
    ``GroupStateTimeout.EventTimeTimeout``) — so an abandoned key still
    emits its final session. ``watermark_delay`` is the out-of-orderness
    budget: events arriving later than it (relative to the max event
    time seen) are DROPPED by the watermark; a late event WITHIN the
    budget merges into the open session with widen-only bounds
    (``start``/``last`` move only outward — a late arrival can never
    regress ``session_end`` or the idle-flush horizon). Stragglers more
    than ``gap`` before the open session accumulate into a pending early
    session (consecutive ones within gap of each other merge, matching
    the batch twin) that closes at batch end — or is absorbed into the
    open session if intervening events bridge the gap. Shrink the budget
    for perfectly ordered sources (tests pin
    '0 seconds' for determinism), grow it for lateness-prone ones —
    idle flushes then lag by the same margin."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes * 60_000_000),
            _out_schema(events, key_col),
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch twin: lag -> gap flag -> running sum = session id -> group.
    Both window functions and the final aggregate share the ``user_id``
    partitioning, so Catalyst plans ONE shuffle for the whole operator."""
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = (
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us)
    ).cast("long")
    return (
        events.withColumn("_new", new_s)
        .withColumn("session_id", F.sum("_new").over(run))
        .groupBy(F.col(key_col).alias("user_id"), "session_id")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


_SESS_GAP_MINUTES = 24 * 60  # 1-day gap over the months-spanning events table


def sess_gap_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: gap-based sessions per user over the events table."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=_SESS_GAP_MINUTES)


def sess_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same gap sessions via Spark's BUILT-IN ``session_window``
    operator — the compose-built-ins-first formulation (one groupBy, the
    state machinery lives inside the operator). Boundary semantics match
    :func:`sessionize_batch` exactly: an event at ``last + gap`` extends
    the session (inclusive), one past it splits — probed empirically and
    pinned by the shared DuckDB oracle. In streaming mode the same
    expression works under a watermark, which is why it is declared here
    next to the stateful twin."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{_SESS_GAP_MINUTES} minutes"), F.col("user_id")
        )
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


SESS_NATIVE_WINDOW_SQL_TEMPLATE = """
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM o
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
"""


SESS_GAP_SPLIT_SQL = f"""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {_SESS_GAP_MINUTES * 60_000_000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               -- CAST: DuckDB integer window sum() yields HUGEINT
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM o
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""
