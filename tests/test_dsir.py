"""DSIR importance resampling (`operators/dsir.py`) — the sf0.01 oracle
run proves engine-vs-DuckDB equality; these prove the MATH is the
published formula (exact pure-Python replay) and the SELECTION behaves
the way a data-curation user expects (target-like documents outrank
off-target ones; empty documents never score)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators import dsir


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, l, "srcT", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def _py_scores(rows, target_ids):
    """Exact replay of the engine formula: md5 60-bit buckets, add-1
    smoothed ratios quantized to integer micro-nats (round half away
    from zero, matching Spark/DuckDB ROUND), integer per-doc sum."""

    def grams(text):
        words = " ".join(text.lower().split()).split(" ")
        if words == [""]:
            return []
        return words + [f"{a} {b}" for a, b in zip(words, words[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dsir.N_BUCKETS

    def q_micro(x):
        y = math.log(x) * 1_000_000
        return int(math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5))

    tq: dict[int, int] = {}
    tp: dict[int, int] = {}
    occ = {}
    for i, t, _l in rows:
        bs = [bucket(g) for g in grams(t)]
        occ[i] = bs
        for b in bs:
            tq[b] = tq.get(b, 0) + 1
            if i in target_ids:
                tp[b] = tp.get(b, 0) + 1
    nq, np_ = sum(tq.values()), sum(tp.values())
    k = q_micro((nq + dsir.N_BUCKETS) / (np_ + dsir.N_BUCKETS))
    out = {}
    for i, bs in occ.items():
        if not bs:
            continue
        sl = sum(q_micro((tp.get(b, 0) + 1.0) / (tq.get(b, 0) + 1.0)) for b in bs)
        out[i] = (len(bs), sl + len(bs) * k)
    return out


def test_dsir_scores_match_pure_python_replay(spark, tmp_path):
    """score_micro is the exact integer the published formula produces —
    buckets, smoothing, quantization, and the normalization constant all
    replayed independently with hashlib + math.log."""
    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the quick brown fox jumps", "en"),
        (3, "der schnelle braune fuchs", "de"),
        (4, "el zorro marron rapido salta", "es"),
        (5, "the slow red fox", "en"),
        (6, "   ", "en"),  # normalized-empty: no grams, no score row
    ]
    d = _write_docs(spark, tmp_path, rows)
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, d, "documents")
    got = {
        r["doc_id"]: (r["n_grams"], r["score_micro"])
        for r in dsir.dsir_scores(docs, docs.filter(F.col("lang") == "en")).collect()
    }
    want = _py_scores(rows, target_ids={1, 2, 5, 6})
    assert got == want
    assert 6 not in got


def test_dsir_select_prefers_target_like_documents(spark, tmp_path):
    """Raw pool = 4 docs built from the target's vocabulary + 4 from a
    disjoint vocabulary; with target = the on-vocab slice, the top-4
    selection is exactly the on-vocab docs, in weight order."""
    on = "alpha beta gamma delta epsilon"
    off = "zulu yankee xray whiskey victor"
    rows = [(i, on, "en") for i in range(4)] + [
        (i, off, "de") for i in range(10, 14)
    ]
    d = _write_docs(spark, tmp_path, rows)
    from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, d, "documents")
    sel = dsir.dsir_select(docs, docs.filter(F.col("lang") == "en"), 4).collect()
    assert sorted(r["doc_id"] for r in sel) == [0, 1, 2, 3]
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in dsir.dsir_scores(docs, docs.filter(F.col("lang") == "en")).collect()
    }
    assert min(scores[i] for i in range(4)) > max(scores[i] for i in range(10, 14))
