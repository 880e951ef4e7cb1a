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
from pyspark.storagelevel import StorageLevel

from automated_datastore_discovery_with_aws_glue_spark.operators.rebalance import spread
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

    The hashed-shingle frame is the prefix index AND both verification
    sides, so it is persisted (memory-and-disk; hashes only, never the
    text) — one shingling pass instead of three; ``spread`` rebalances
    unsplittable inputs before the CPU-heavy shingle stage.
    """
    num = int(round(threshold * 10000))
    base = (
        spread(df.select(F.col(id_col).alias("id"), F.col(block_col).alias("block"), F.col(text_col).alias("_t")))
        .select("id", "block", word_shingles(F.col("_t"), n).alias("sh"))
        # canonical order = hashed shingles, sorted; verification uses
        # hashes too (intersection cardinality is order/collision-stable)
        .withColumn("hs", F.sort_array(F.transform("sh", lambda s: F.xxhash64(s))))
        .drop("sh")
        .withColumn("sz", F.size("hs"))
        .withColumn("plen", F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)).cast("int") + 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
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

def _shingle_frame(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh) with sh = distinct word n-grams; input spread first so the
    shingling stage parallelizes even off unsplittable files."""
    return spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select("id", word_shingles(F.col("_t"), n).alias("sh"))


def _signatures_of(sh_frame: DataFrame, num_hashes: int) -> DataFrame:
    exploded = sh_frame.select("id", F.explode("sh").alias("shingle"))
    mins = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


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
    return _signatures_of(_shingle_frame(df, id_col, text_col, n), num_hashes)


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
    J >= ~0.5 with high recall.

    The shingle frame feeds the signature aggregate and both
    verification sides — persisted once (hash arrays, never text)."""
    rows = num_hashes // bands
    sh = _shingle_frame(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = _signatures_of(sh, num_hashes)
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
    toks = spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select(
        "id",
        F.explode(F.array_distinct(F.split(normalize_text(F.col("_t")), " "))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    # per-bit ones-count instead of signed sums: sign-sum > 0 iff
    # 2*ones > n_tokens, and the branch-free update keeps the generated
    # aggregate small enough for whole-stage codegen (the `when` version
    # compiles ~2x slower and risks interpreted fallback)
    ones = [
        F.sum(F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1))).alias(f"o{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *ones)
    sketch = None
    for i in range(64):
        bit = (F.col(f"o{i}") * 2 > F.col("n")).cast("long")
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

    Candidate generation is EXACT band-blocking (Manku et al., WWW'07):
    split the 64-bit sketch into ``max_hamming + 1`` disjoint bit bands —
    by pigeonhole, two sketches within ``max_hamming`` bits agree on at
    least one whole band — and equi-join on (block, band, band-bits).
    Work scales with band collisions, never all pairs; verification is a
    single bit_count per candidate."""
    bands = max_hamming + 1
    width = 64 // bands
    mask = (1 << width) - 1
    s = simhash64(df, id_col, text_col)
    blocks = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("block"))
    # both sides of the band join read the sketch frame — persist the
    # (id, simhash, block) triple (16B/doc) so sketches compute once
    base = s.join(blocks, "id").persist(StorageLevel.MEMORY_AND_DISK)
    banded = base.select(
        "id",
        "block",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "block", "bb.band", "bb.key")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["block", "band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.join(base.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b")), "id_b")
        .filter(hamming <= max_hamming)
        .select("id_a", "id_b", hamming.alias("hamming"))
    )
