"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect); the session
build is excluded (the engine is long-lived by design — no per-job cold
start, unlike the reference's per-table Glue jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from automated_datastore_discovery_with_aws_glue_spark.operators.cache import release
from automated_datastore_discovery_with_aws_glue_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "j1_latest_per_key",
    "j3_lookup_join",
    "s8_merge_insert",
    "f10_time_bucket",
    "pii_classify_derived",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "lang_identify",
    "knn_bruteforce",
    "knn_lsh",
    "knn_batch",
    "text_repetition",
    "emb_near_dup",
    "emb_near_dup_lsh",
    "emb_canonical",
    "sess_gap_split",
    "sess_native_window",
    # the constant-memory approx path (exact `percentile` buffers every
    # value — correct here, an OOM at 100 TB; its tolerance gate is the
    # oracle-backed prof_numeric_quantiles_approx entry)
    "prof_numeric_quantiles_approx_est",
    # composed corpus pipelines: LSH candidates by default (r5) —
    # corpus_clean is the oracle-checked md5-LSH chain, corpus_clean_xxh
    # the xxhash64 production path (identical shape, faster hashes),
    # corpus_clean_exact the PPJoin exact mode kept for comparison
    "corpus_clean",
    "corpus_clean_xxh",
    "corpus_clean_exact",
    "corpus_prepare",
    "para_dedup",
    "agg_cube",
    "pii_redact",
    "tok_pack_sequences",
    "corpus_decontaminate",
    # r6 additions: mergeable classify counts, learned-style quality
    # scorer, per-doc TF-IDF top-k, unigram LM perplexity, real WAV
    # decode through the Arrow kernel
    "pii_classify_counts",
    "text_quality_classifier",
    "doc_tfidf_topk",
    "doc_lm_perplexity",
    "mm_audio_decode",
    "corpus_filter_signals",
    # r7: the RECURRING-cost paths — two-batch dedup-index ingest
    # (bulk + delta) and file-level incremental re-classify through the
    # real engine; regressions in the daily-delta economics show here
    "incr_dedup_ingest",
    "incr_classify_delta",
    # r7: repeated-span analysis (+trim), Gopher rule set, real pixel
    # stats, CMS heavy hitters, weighted sampling, order-2 LM
    "corpus_dup_spans",
    "corpus_strip_dup_spans",
    "corpus_gopher_filters",
    "mm_pixel_stats",
    "prof_heavy_hitters_cms",
    "corpus_sample_weighted",
    "doc_lm_perplexity_bigram",
    "j_asof_rate",
    "j_range_burst",
    # r8: temporal-join directions + pair emission, the corpus-trained
    # BPE tokenizer (training + encode + token-exact packing), real
    # multi-frame GIF sampling, and the int8-quantized IVF read path
    "j_asof_nearest",
    "j_range_pairs",
    "tok_bpe_encode",
    "tok_pack_sequences_bpe",
    "mm_gif_frame_sample",
    # r11: the persisted-index serving family replaces the rows-only
    # knn_ivf_q8/knn_ivf_pq bench rows (VERDICT r10 items 1/4/6)
    "knn_index_topk_exact",
    "knn_index_topk_adc",
    "emb_index_join",
    "corpus_decontaminate_bloom",
    "j_salted_skew_enrich",
    # r8 second wave: behavioral analytics (funnel / cohort retention),
    # sorted-neighborhood record linkage, per-frame audio features
    # through the real WAV kernel
    "ev_funnel",
    "ev_cohort_retention",
    "er_sorted_neighborhood",
    "mm_audio_features",
    # r8 third wave: ER components + survivorship, schema-drift report,
    # bigram collocations by lift
    "er_clusters",
    "cat_schema_drift",
    "colloc_lift",
    # r8 fourth wave: DSIR importance resampling + SCD2 dimension history
    "corpus_dsir_weights",
    "scd2_customer_history",
    "dq_suite_report",
    "fuzzy_join_docs",
    "ts_gapfill_hourly",
    "mm_audio_adpcm",
    "ev_anomaly_zscore",
    "src_orc_roundtrip",
    "ev_top_paths",
    "incr_distinct_hll",
    "graph_pagerank",
    "ev_attribution",
    "w_hopping_counts",
    "src_bucketed_join",
    # r9: distributed k-means quantizer training (3 full Lloyd passes),
    # the stream-stream interval-join batch twin, MJPEG/AVI frame
    # sampling through the vendored container+JPEG kernels, and the
    # ANN recurring-cost lifecycle (IVF build + O(batch) delta ingest)
    "knn_kmeans_centroids",
    "knn_pq_codebooks",
    "j_stream_enrich_twin",
    "mm_video_frame_sample",
    "mm_audio_adpcm_stereo",
    "incr_ann_ingest",
    # r10: end-to-end IVF-PQ ADC scoring (probe + lookup-table score +
    # exact re-rank, all oracle-replayed) and the cell-occupancy /
    # assignment-distance drift report
    "knn_ivf_pq_scored",
    "ann_cell_balance",
    "emb_ivf_join",
    # r9 fourth wave: ranking-window suite, fused correlation matrix,
    # cluster-balanced corpus selection (k-means composition)
    "w_ranking_suite",
    "prof_correlation",
    "corpus_cluster_sample",
    # r11: HTML -> clean-text ingest stage (regex extraction + keep
    # rules, the whole pipeline oracle-replayed) and the drift-history
    # math twin; the persisted-index serving rows ride earlier in the
    # list (knn_index_*, emb_index_join)
    "corpus_html_extract",
    "ann_drift_twin",
    # r11 second wave: the URL/web-ingest layer (canonicalization +
    # eTLD+1 + dup rank; dedup -> blocklist -> two-phase domain cap)
    # and cp1252 encoding repair
    "corpus_url_normalize",
    "corpus_domain_cap",
    "corpus_fix_encoding",
    "corpus_dedup_encoding",
    "corpus_ingest_web",
    "corpus_robots_filter",
    "corpus_sitemap_discovery",
    # r12: PSL registrable domains (broadcast longest-suffix join),
    # the WARC container roundtrip (offset parse -> html_extract), and
    # robots.txt directive extraction (Crawl-delay + Sitemap links)
    "corpus_psl_domains",
    "src_warc_extract",
    "corpus_robots_directives",
    # r13: HTTP envelopes inside WARC payloads (charset transcode +
    # status gate) and IDN/punycode host folding to one canonical key
    "src_warc_http",
    "corpus_idn_hosts",
    # r14: RFC 9309 agent-group selection, redirect-frontier discovery
    # (Location resolve -> classify), charset-family/deflate/HTTP2
    # envelope coverage, digest-keyed zero-decode revisit dedup, and
    # the per-host politeness schedule
    "corpus_robots_agents",
    "corpus_redirect_frontier",
    "src_warc_charsets",
    "src_warc_revisit",
    "crawl_schedule",
    # r14b: caching-validator recrawl planning, multi-hop redirect
    # resolution, anchor-edge link graph, and host-authority PageRank
    # over the crawl's own graph
    "corpus_recrawl_plan",
    "corpus_redirect_chains",
    "corpus_link_graph",
    "corpus_host_rank",
    "corpus_crawl_cycle",
    "corpus_canonical_dedup",
    # r14c: the crawl-frontier recurring cost (bulk + daily delta
    # through the persisted partition-pruned seen-set)
    "incr_frontier_ingest",
]


def main() -> None:
    # the bench marathon runs ~76 queries in ONE long-lived JVM; size the
    # driver for the 128 GiB harness box (env still wins) — at 8g the
    # accumulated session state can push a late broadcast build over the
    # driver ceiling
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on synthetic data (touches no test table):
    # the engine is long-lived, so steady-state per-query cost is the
    # honest number — not the first-ever codegen compile.
    spark.range(1_000_000).selectExpr("sum(id)", "count(*)").collect()
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h").groupBy("h").count().collect()
    # higher-order-function + hash expression warm-up: compiles the
    # transform/aggregate/zip_with + xxhash64 codegen and Janino paths the
    # sketch queries use, again on synthetic rows only
    spark.range(1000).selectExpr(
        "aggregate(transform(sequence(1, 16), i -> xxhash64(id, i)), cast(0 as bigint), (a, b) -> a ^ b) s",
        "array_min(transform(split(repeat(concat('w', id, ' '), 8), ' '), w -> xxhash64(w))) m",
    ).selectExpr("min(s)", "min(m)").collect()
    # zip_with double-fold (the similarity kernels' dot-product shape) and
    # indexed 2-D literal lookup (the LSH/IVF plane matrices)
    spark.range(1000).selectExpr(
        "aggregate(zip_with(array(cast(id as double), 1.0), "
        "element_at(array(array(1.0, 2.0), array(3.0, 4.0)), cast(id % 2 + 1 as int)), "
        "(x, y) -> x * y), cast(0.0 as double), (a, b) -> a + b) d"
    ).selectExpr("min(d)").collect()
    # vectorized parquet reader + ColumnarToRow codegen (synthetic file;
    # measured: halves the first real scan's wall-clock)
    import shutil
    import tempfile

    warm_root = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        warm_dir = os.path.join(warm_root, "t")
        spark.range(10_000).selectExpr(
            "id", "cast(id as double) v", "cast(id as string) s", "timestamp_micros(id) ts"
        ).write.parquet(warm_dir)
        spark.read.parquet(warm_dir).selectExpr("sum(v)", "max(s)", "max(ts)").collect()
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)

    # Per-query fault isolation: one broken query must never zero out the
    # whole run's perf signal — record its error and keep timing the rest.
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = None
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            timings[name] = round(time.perf_counter() - t0, 3)
            _ = len(rows)
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            # operators adopt their internal persisted frames onto the
            # returned DataFrame; release() frees them deterministically
            # so one query's caches never charge the next query's memory
            # — ON FAILURE TOO, or a failed query skews what follows
            if df is not None:
                release(df)

    # A partial run must not masquerade as a full one: with any failed
    # query the headline total is incomparable, so report null + rc=1
    # (per-query timings stay for diagnosis).
    total = None if errors else round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        result["errors"] = errors

    # The driver captures only the last ~2000 chars of output and parses the
    # final JSON line; at 80+ queries the full per-query map outgrew that
    # window (round 8's BENCH artifact was truncated mid-key, parsed: null).
    # So: always persist the full detail to a local file, and keep the
    # PRINTED line short — inline the per-query map only while it still fits
    # the capture window with headroom.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_LOCAL_sf{sf}.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(result, fh)
    line = json.dumps(result)
    if len(line) > 1600:
        short = {k: v for k, v in result.items() if k != "queries"}
        short["n_queries"] = len(timings)
        if errors:
            short["n_errors"] = len(errors)
            short.pop("errors", None)
        short["queries_file"] = os.path.basename(detail_path)
        line = json.dumps(short)
    print(line)
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
