"""Deduplication operators for LLM-data pipelines at 100 TB scale:

- exact dedup           — fingerprint group-by (one shuffle on a 128-bit key)
- n-gram Jaccard        — blocked self-join + exact set Jaccard
- MinHash + LSH         — shingle -> 64-perm signature -> banded bucket
                          join -> verify; candidate generation never
                          compares all pairs (the scale path)
- SimHash               — 64-bit sign-sum sketch + blocked Hamming join

Everything is native DataFrame ops (explode / higher-order functions /
xxhash64 / bit ops) — no Python in the hot path. The quadratic variants
take a blocking column; at 100 TB you block (by language, length bucket,
LSH band) or you don't run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from automated_datastore_discovery_with_aws_glue_spark.operators.text import fingerprint, normalize_text


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: representative = min id,
    plus duplicate count. Single hash aggregate on the md5 fingerprint —
    shuffle carries (fingerprint, id, count) only, never the text."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (whole text as a
    single shingle when shorter than n words)."""
    words = F.split(normalize_text(col), " ")
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within blocks.

    Scale design — prefix-filtered set-similarity join (the All-Pairs /
    PPJoin candidate rule; public literature: Bayardo et al. WWW'07,
    Vernica et al. SIGMOD'10):

    1. Shingles get a canonical total order (their xxhash64 — a proxy
       for rarest-first). For J >= t it suffices to index each doc's
       first ``|sh| - ceil(t*|sh|) + 1`` shingles: any qualifying pair
       must share an indexed prefix shingle.
    2. Candidates = inverted-index equi-join on (block, prefix-shingle)
       — work scales with shared-shingle pairs, never all pairs.
    3. Size-compatibility prune (J>=t implies min/max sizes >= t) with
       integer arithmetic, then exact verification: one array_intersect
       per surviving candidate; |A∪B| = |A|+|B|-|A∩B| so no union
       array materializes.

    Threshold compares use integer cross-multiplication so engine float
    quirks can't flip boundary pairs. Output: (id_a, id_b, jaccard).
    """
    num = int(round(threshold * 10000))
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("block"),
            word_shingles(F.col(text_col), n).alias("sh"),
        )
        # canonical order = hashed shingles, sorted; verification uses
        # hashes too (intersection cardinality is order/collision-stable)
        .withColumn("hs", F.sort_array(F.transform("sh", lambda s: F.xxhash64(s))))
        .drop("sh")
        .withColumn("sz", F.size("hs"))
        .withColumn("plen", F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)).cast("int") + 1)
    )
    pref = base.select(
        "id", "block", "sz", F.explode(F.slice("hs", 1, F.col("plen"))).alias("ph")
    )
    a = pref.select(F.col("id").alias("id_a"), "block", F.col("sz").alias("sz_a"), "ph")
    b = pref.select(F.col("id").alias("id_b"), "block", F.col("sz").alias("sz_b"), "ph")
    size_ok = F.least("sz_a", "sz_b") * 10000 >= F.lit(num) * F.greatest("sz_a", "sz_b")
    cand = (
        a.join(b, ["block", "ph"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(size_ok)
        .select("id_a", "id_b")
        .distinct()
    )
    sets = base.select("id", "hs", "sz")
    joined = (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        joined.filter(F.col("inter") * 10000 >= F.lit(num) * union)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter").cast("double") / union, 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """64-permutation MinHash signature per document.

    The i-th permutation is ``xxhash64(shingle, i)`` — an independent
    64-bit mix per i with no modular arithmetic (ANSI-safe). One explode
    + one hash aggregate (num_hashes MIN columns, map-side combined) —
    the shuffle carries a 64-long vector per document, never the
    shingles."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded LSH + exact-Jaccard verification.

    Candidate generation: signatures split into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band bucket become
    candidates (equi-join on (band, bucket-hash) — linear shuffle, never
    all-pairs). Verification recomputes exact shingle Jaccard on the
    candidates only. With 16 bands x 4 rows the S-curve catches
    J >= ~0.5 with high recall."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bandix: F.struct(
                    bandix.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice("signature", bandix * rows + 1, rows), lambda v: v.cast("string")))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    num = int(round(threshold * 10000))
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(inter * 10000 >= F.lit(num) * union)
        .select("id_a", "id_b", F.round(inter.cast("double") / union, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: explode tokens, one
    aggregate with 64 signed bit-sums, reassemble the sketch with bit
    arithmetic."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*sums)
    sketch = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sketch = term if sketch is None else sketch.bitwiseXOR(term)
    return agg.select("id", sketch.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming within blocks.
    (At scale, the block key would be simhash prefix chunks — pigeonhole:
    two sketches within d bits share one of d+1 prefix bands.)"""
    s = simhash64(df, id_col, text_col)
    blocks = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("block"))
    base = s.join(blocks, "id")
    a = base.select(F.col("id").alias("id_a"), "block", F.col("simhash").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), "block", F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming <= max_hamming)
        .select("id_a", "id_b", hamming.alias("hamming"))
    )
