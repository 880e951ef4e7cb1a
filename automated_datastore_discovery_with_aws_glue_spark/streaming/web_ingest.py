"""Streaming web-ingest composition (r12, VERDICT r11 item 5): the
foreachBatch twin of the batch ``corpus_ingest_web`` plan — how a
crawler actually feeds the corpus (the reference's event-driven
onboarding shape, `lambda/s3-trigger/app.py:179-242`, re-expressed as
Structured Streaming + the versioned state store).

Stage order is the same checked contract as the batch plan:

1. **repair BEFORE the gate** — ``fix_encoding`` on the raw text
   (corruption inflates token counts);
2. **token-count quality gate** — map-side, on the stream;
3. **canonicalize + frontier dedup** — ``stream_url_dedup``
   (:mod:`streaming.dedup`): percent-/tracker-/case-normalized URL as
   the dedup key, ``dropDuplicatesWithinWatermark`` state bounded by
   the horizon, unparseable/invalid-escape URLs quarantined to NULL
   and dropped;
4. **robots gate + commit, inside foreachBatch** — the per-batch frame
   joins the (tiny, broadcast) parsed rule table via
   ``operators/web.robots_filter`` (RFC-9309 wildcards included), and
   the survivors MERGE into the state-store table keyed on the
   canonical URL — WHEN-NOT-MATCHED-INSERT only, so an at-least-once
   replay of a micro-batch after a crash re-inserts nothing
   (exactly-once EFFECT, the same hinge as ``streaming/onboard.py``).

Scale: stages 1-3 are map-side or watermark-bounded state; the robots
join broadcasts per-host metadata; the MERGE is keyed on the canonical
URL — high-cardinality and skew-free. Nothing here is corpus-scale
state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from automated_datastore_discovery_with_aws_glue_spark.operators.text import fix_encoding, token_count
from automated_datastore_discovery_with_aws_glue_spark.operators.web import (
    robots_filter,
    url_host,
    url_raw_target,
)
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore
from automated_datastore_discovery_with_aws_glue_spark.streaming.dedup import stream_url_dedup


def web_ingest_stream(
    pages: DataFrame,
    rules: DataFrame,
    store: ParquetStateStore,
    table: str,
    checkpoint_dir: str,
    *,
    id_col: str = "page_id",
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str = "ts",
    min_tokens: int = 3,
    dedup_horizon: str = "10 minutes",
    available_now: bool = True,
):
    """Start the composed ingest stream over a page feed
    ``(id, url, text, ts)``; robots verdicts come from the STATIC
    parsed rule table ``rules`` (``operators/web.robots_rules``
    output: host / rule / prefix). Accepted pages land in ``table``
    as ``(url_norm, id, host, n_tokens, clean_text)`` — one row per
    canonical URL, first accepted sighting wins, replays suppressed
    by both the watermark state (in-horizon) and the MERGE key
    (forever)."""
    staged = (
        pages.withColumn("clean_text", fix_encoding(F.col(text_col)))
        .withColumn("n_tokens", token_count(F.col("clean_text")))
        .filter(F.col("n_tokens") >= min_tokens)
    )
    deduped = stream_url_dedup(
        staged, url_col=url_col, ts_col=ts_col, dedup_horizon=dedup_horizon
    )

    def _gate_and_commit(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        b = batch.withColumn("host", url_host(F.col(url_col))).withColumn(
            "_target", url_raw_target(F.col(url_col))
        )
        gated = robots_filter(
            b, rules, id_col=id_col, key_col="host", path_col="_target"
        )
        accepted = gated.filter(F.col("allowed")).select(
            "url_norm", id_col, "host", "n_tokens", "clean_text"
        )
        store.merge(table, accepted, "url_norm")

    writer = (
        deduped.writeStream.foreachBatch(_gate_and_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def warc_ingest_stream(
    containers: DataFrame,
    rules: DataFrame,
    store: ParquetStateStore,
    table: str,
    checkpoint_dir: str,
    *,
    data_col: str = "wdata",
    ts_col: str = "ts",
    min_tokens: int = 3,
    dedup_horizon: str = "10 minutes",
    available_now: bool = True,
    compression: str = "none",
):
    """Container-in, corpus-out (r13): the stream twin of the FULL
    WARC -> corpus path. Each micro-batch's containers are scanned by
    ``sources/warc.warc_records(http_envelope=True)`` — record offset
    arithmetic, HTTP status/header split, charset transcode to utf-8
    (``mapInPandas`` composes with Structured Streaming; the scan is
    stateless per container) — then gated on ``valid`` AND
    ``http_status == 200`` so error and redirect bodies never become
    corpus, the body run through ``html_extract``, and the resulting
    page feed handed to the SAME staged pipeline as
    :func:`web_ingest_stream` (repair -> token gate -> watermark
    frontier dedup -> robots gate -> exactly-once MERGE). Page
    identity is the record's ``WARC-Target-URI`` — in a crawl archive
    that IS the fetched URL, so it also drives canonicalization,
    robots, and the MERGE key. Malformed records and non-200 rows are
    dropped HERE, loudly countable upstream via the same
    ``warc_records`` frame a quarantine sink would tap."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.text import html_extract
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import warc_records

    recs = warc_records(
        containers, data_col, http_envelope=True, compression=compression
    )
    # payload NULL = a declared-binary body the scanner WITHHELD from
    # the text lane (image/pdf/octet-stream — transcoding those would
    # mint mojibake); only real text reaches extraction
    pages = recs.filter(
        F.col("valid")
        & (F.col("http_status") == 200)
        & F.col("payload").isNotNull()
    ).select(
        F.col("target_uri").alias("url"),
        html_extract(F.col("payload")).alias("text"),
        F.col(ts_col),
    )
    # the URL is the page identity — no duplicated id column riding
    # the watermark dedup state for the whole horizon
    return web_ingest_stream(
        pages,
        rules,
        store,
        table,
        checkpoint_dir,
        id_col="url",
        url_col="url",
        text_col="text",
        ts_col=ts_col,
        min_tokens=min_tokens,
        dedup_horizon=dedup_horizon,
        available_now=available_now,
    )
