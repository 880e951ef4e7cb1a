"""Corpus-trained BPE tokenizer (operators/bpe.py): training argmax
order, merge replay on unseen words, encode-count consistency, and the
packing parity the tokenizer exists to make token-exact."""

from __future__ import annotations

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.operators import bpe as BPE


def _train_on(spark, texts, **kw):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    return BPE.bpe_train(BPE.word_counts(docs), **kw)


def test_bpe_learns_expected_merges(spark):
    """On an engineered corpus the merge sequence is hand-checkable:
    'ab' dominates pair counts, then 'ab'+'c' composes on top of it."""
    # "abc" x 9 words, "abd" x 3, "xy" x 2 -> pairs: (a,b)=12, (b,c)=9,
    # (b,d)=3, (x,y)=2. Merge1 = a+b. Then (ab,c)=9 wins merge2.
    texts = ["abc " * 9, "abd " * 3, "xy " * 2]
    merges = _train_on(spark, texts, n_merges=3)
    assert [(m["lhs"], m["rhs"]) for m in merges[:2]] == [("a", "b"), ("ab", "c")]
    assert merges[0]["pair_count"] == 12
    assert merges[1]["pair_count"] == 9
    # merge3: remaining pairs (ab,d)=3 vs (x,y)=2 -> ab+d
    assert (merges[2]["lhs"], merges[2]["rhs"]) == ("ab", "d")


def test_bpe_tie_breaks_deterministic(spark):
    """Equal pair counts resolve (lhs asc, rhs asc) — identical on
    every run."""
    texts = ["pq rs " * 5]  # (p,q)=5 and (r,s)=5 tie -> (p,q) first
    for _ in range(3):
        merges = _train_on(spark, texts, n_merges=2)
        assert [(m["lhs"], m["rhs"]) for m in merges] == [("p", "q"), ("r", "s")]


def test_bpe_exhaustion_stops_early(spark):
    """Single-letter vocabulary has no pairs: training returns fewer
    merges than requested instead of failing."""
    merges = _train_on(spark, ["a b c a b c"], n_merges=5)
    assert merges == []


def test_bpe_encode_replays_merges_on_unseen_words(spark):
    """Merge replay segments a word that was NEVER in the training
    vocabulary exactly as training would have: 'abcab' with learned
    merges a+b, ab+c -> [abc][ab] = 2 tokens."""
    merges = _train_on(spark, ["abc " * 9, "abd " * 3], n_merges=2)
    assert [(m["lhs"], m["rhs"]) for m in merges] == [("a", "b"), ("ab", "c")]
    df = spark.createDataFrame([("abcab",), ("zzz",), ("ab cd ab",)], ["text"])
    out = df.select(
        BPE.token_count_expr(BPE.encode_seg_expr(F.col("text"), merges)).alias("n")
    ).collect()
    # abcab -> <abc><ab> = 2; zzz -> 3 single chars; "ab cd ab" -> 1+2+1
    assert [r["n"] for r in out] == [2, 3, 4]


def test_bpe_encode_blocks_cross_word_merges(spark):
    """The space separator must stop a merge from bridging two words:
    'a b' stays 2 tokens even when (a,b) is the top merge."""
    merges = _train_on(spark, ["ab " * 5], n_merges=1)
    assert [(m["lhs"], m["rhs"]) for m in merges] == [("a", "b")]
    df = spark.createDataFrame([("a b",), ("ab",), ("a-b.ab",)], ["text"])
    out = df.select(
        BPE.token_count_expr(BPE.encode_seg_expr(F.col("text"), merges)).alias("n")
    ).collect()
    # "a b" -> <a> <b> = 2; "ab" -> 1; "a-b.ab" -> punct separates: a, b, ab = 3
    assert [r["n"] for r in out] == [2, 1, 3]


def test_bpe_overlap_left_to_right(spark):
    """Overlapping occurrences merge left-to-right (the BPE convention):
    'aaa' under merge (a,a) segments [aa][a] = 2 tokens, never 1."""
    merges = [{"step": 1, "lhs": "a", "rhs": "a", "merged": "aa", "pair_count": 1}]
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("aaaaa",)], ["text"])
    out = df.select(
        BPE.token_count_expr(BPE.encode_seg_expr(F.col("text"), merges)).alias("n")
    ).collect()
    assert [r["n"] for r in out] == [2, 2, 3]


def test_bpe_encode_stays_jvm_side(spark):
    """The encode expression chain must plan with no Python eval, no
    join, and no exchange — a pure scan-side expression."""
    merges = [
        {"step": 1, "lhs": "t", "rhs": "h", "merged": "th", "pair_count": 9},
        {"step": 2, "lhs": "th", "rhs": "e", "merged": "the", "pair_count": 7},
    ]
    df = spark.createDataFrame([("the theme",)], ["text"])
    out = df.select(
        BPE.token_count_expr(BPE.encode_seg_expr(F.col("text"), merges)).alias("n")
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for node in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, (node, plan)
    # hand check: "the" -> [the] = 1 token; "theme" -> [the][m][e] = 3
    assert out.collect()[0]["n"] == 4


def test_bpe_packing_parity_with_counts(spark, tmp_path):
    """tok_pack_sequences_bpe packs exactly the counts tok_bpe_encode
    reports: start offsets are the per-lang prefix sums of
    n_tokens_total, recomputed independently here."""
    import pandas as pd

    from automated_datastore_discovery_with_aws_glue_spark.plans import llm_pipeline as L

    sf_dir = "/root/testdata/sf0.001"
    enc = L.EXTRA_QUERIES["tok_bpe_encode"](spark, sf_dir).toPandas()
    packed = L.EXTRA_QUERIES["tok_pack_sequences_bpe"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    ).toPandas()
    merged = packed.merge(enc[["doc_id", "n_tokens_total"]], on="doc_id").merge(
        docs, on="doc_id", suffixes=("", "_docs")
    )
    assert (merged["n_tokens"] == merged["n_tokens_total"]).all()
    merged = merged.sort_values(["lang", "doc_id"])
    expect_cum = merged.groupby("lang")["n_tokens_total"].cumsum()
    assert (merged["cum_tokens"] == expect_cum).all()
    assert (merged["start_offset"] == expect_cum - merged["n_tokens_total"]).all()
    assert isinstance(merged, pd.DataFrame)
