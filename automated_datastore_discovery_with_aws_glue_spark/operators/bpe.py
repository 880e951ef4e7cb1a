"""Corpus-trained byte-pair-encoding tokenizer (Sennrich et al. 2016
shape), Spark-first.

Training never touches the corpus more than ONCE: the only corpus-scale
pass is the word-frequency aggregate; the merge loop then runs on the
capped word-TYPE table (``top_words`` rows — metadata scale, independent
of corpus size), one tiny pair-count aggregate per merge round. Encoding
is a pure map-side expression: the learned merges are baked into a chain
of literal ``replace`` calls — no join, no shuffle, no Python, whatever
the corpus size. That is exactly the 100 TB shape: train once on the
vocabulary, apply everywhere as a broadcast-free scan expression.

Representation: a word's segmentation is its symbols each wrapped as
``<sym>`` (words are lowercase letter runs, so ``<``/``>`` can never
occur inside a symbol). Applying merge ``(x, y) -> xy`` is the literal
replace ``'<x><y>' -> '<xy>'`` — non-overlapping left-to-right, the BPE
convention — identically expressible in Spark and DuckDB, which is what
makes the whole tokenizer (training included) differentially checkable.

Merge-replay property used by the encoder: merge *i*'s two symbols can
only be produced by merges ``< i``, so replaying the merges once each,
in learned order, segments ANY word (vocabulary or not) exactly as
training would have.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

#: lowercase letter runs — the word alphabet BPE trains over; digit runs
#: and punctuation stay single pre-tokenizer tokens (``_TOK_RX`` family)
WORD_RX = "[a-z]+"

#: default merge rounds / vocabulary cap for the declared queries (small
#: enough that the DuckDB oracle unrolls the whole training, large
#: enough that multi-character subwords emerge on the test corpora)
N_MERGES = 12
TOP_WORDS = 256


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The ONE corpus-scale pass: (word, cnt) frequencies of lowercase
    letter runs. Partial aggregation map-side; output is vocabulary
    scale."""
    w = F.explode(F.regexp_extract_all(F.lower(text_col), F.lit(WORD_RX), 0))
    return docs.select(w.alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _wrap(col: Column) -> Column:
    """Initial segmentation: every letter becomes its own ``<c>``."""
    return F.regexp_replace(col, "([a-z])", "<$1>")


def bpe_train(
    words: DataFrame,
    *,
    n_merges: int = N_MERGES,
    top_words: int = TOP_WORDS,
) -> list[dict]:
    """Learn up to ``n_merges`` merges from a (word, cnt) frequency
    table. The capped word-TYPE table is collected once (``top_words``
    rows — the bounded in-memory table every BPE trainer holds; the
    corpus itself is never collected). The merge loop then runs
    entirely on the driver: the segmentations already live there, so
    each round's pair count is an exact-integer dict aggregate with the
    deterministic argmax (count desc, lhs asc, rhs asc), and the winner
    applies via Python ``str.replace`` — the same non-overlapping
    left-to-right semantics as the executor-side ``replace``. (The
    earlier formulation re-created a DataFrame from these driver rows
    every round purely to count pairs distributedly — twelve job
    round-trips over a 256-row table; the scale knob is ``top_words``,
    and any value for which driver counting hurts is already bounded by
    the collect above.) Returns the merges in learned order (fewer than
    ``n_merges`` if pairs exhaust)."""
    import re as _re

    vocab = words.orderBy(F.desc("cnt"), "word").limit(top_words).collect()
    seg_rows = [
        (r["word"], int(r["cnt"]), "".join(f"<{ch}>" for ch in r["word"]))
        for r in vocab
    ]
    sym_rx = _re.compile("<([a-z]+)>")
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        # the get_stats convention: every adjacent symbol pair of every
        # word counts, weighted by the word's corpus count, overlapping
        # positions included — identical to the unrolled oracle CTEs
        counts: dict[tuple[str, str], int] = {}
        for _w, cnt, seg in seg_rows:
            syms = sym_rx.findall(seg)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (lhs, rhs), pc = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": int(pc),
            }
        )
        pat, rep = f"<{lhs}><{rhs}>", f"<{lhs}{rhs}>"
        seg_rows = [(w, c, s.replace(pat, rep)) for (w, c, s) in seg_rows]
    return merges


def encode_seg_expr(text_col: Column, merges: list[dict]) -> Column:
    """Map-side BPE segmentation of a whole document: non-letters
    collapse to single spaces (word separators that block cross-word
    merges), every letter wraps, then each learned merge replays once in
    order as a LITERAL replace — a pure JVM-side expression chain with
    no join, shuffle, or Python anywhere."""
    seg = _wrap(F.regexp_replace(F.lower(text_col), "[^a-z]+", " "))
    for m in merges:
        seg = F.replace(
            seg,
            F.lit(f"<{m['lhs']}><{m['rhs']}>"),
            F.lit(f"<{m['lhs']}{m['rhs']}>"),
        )
    return seg


def token_count_expr(seg: Column) -> Column:
    """Number of BPE symbols in a segmentation = count of ``<`` marks."""
    return (F.length(seg) - F.length(F.replace(seg, F.lit("<")))).cast("int")


# ---------------------------------------------------------------------------
# DuckDB oracle builders: the SAME training unrolled as k CTE stages and
# the SAME encode as k chained replaces — each stage LEFT JOINs its
# 1-row best-pair CTE so pair exhaustion degrades to a no-op on both
# engines identically.
# ---------------------------------------------------------------------------


def training_ctes(
    n_merges: int = N_MERGES, top_words: int = TOP_WORDS
) -> str:
    """WITH-clause body (no ``WITH`` keyword) defining ``seg_0..seg_k``
    and ``best_1..best_k`` over the ``documents`` view."""
    parts = [
        f"""words AS MATERIALIZED (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_extract_all(lower(text), '{WORD_RX}')) AS word
                FROM documents
            ) GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT {top_words}
        )""",
        r"""seg_0 AS MATERIALIZED (
            SELECT word, cnt, regexp_replace(word, '([a-z])', '<\1>', 'g') AS seg
            FROM words
        )""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""pairs_{i} AS MATERIALIZED (
            SELECT split_part(pr, ' ', 1) AS lhs,
                   split_part(pr, ' ', 2) AS rhs,
                   CAST(sum(cnt) AS BIGINT) AS pair_count
            FROM (
                SELECT cnt,
                       unnest(list_transform(
                           generate_series(1, len(syms) - 1),
                           j -> syms[j] || ' ' || syms[j + 1])) AS pr
                FROM (
                    SELECT cnt,
                           regexp_extract_all(seg, '<([a-z]+)>', 1) AS syms
                    FROM seg_{i - 1}
                )
            ) GROUP BY 1, 2
        )""",
        )
        parts.append(
            f"""best_{i} AS MATERIALIZED (
            SELECT lhs, rhs, pair_count FROM pairs_{i}
            ORDER BY pair_count DESC, lhs, rhs LIMIT 1
        )""",
        )
        parts.append(
            f"""seg_{i} AS MATERIALIZED (
            SELECT s.word, s.cnt,
                   coalesce(replace(s.seg, '<' || b.lhs || '><' || b.rhs || '>',
                                    '<' || b.lhs || b.rhs || '>'), s.seg) AS seg
            FROM seg_{i - 1} s LEFT JOIN best_{i} b ON TRUE
        )""",
        )
    return ",\n".join(parts)


def merges_sql(n_merges: int = N_MERGES, top_words: int = TOP_WORDS) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, lhs, rhs, lhs || rhs AS merged, pair_count FROM best_{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {training_ctes(n_merges, top_words)}\n{union}\nORDER BY step"


def encode_ctes(n_merges: int = N_MERGES, top_words: int = TOP_WORDS) -> str:
    """Extends :func:`training_ctes` with ``enc_0..enc_k``: the per-doc
    segmentation replaying each learned merge."""
    parts = [
        training_ctes(n_merges, top_words),
        r"""enc_0 AS MATERIALIZED (
            SELECT doc_id, lang, source,
                   regexp_replace(
                       regexp_replace(lower(text), '[^a-z]+', ' ', 'g'),
                       '([a-z])', '<\1>', 'g') AS seg,
                   len(regexp_extract_all(lower(text),
                       '[0-9]+|[^a-z0-9\s]')) AS n_other
            FROM documents
        )""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""enc_{i} AS MATERIALIZED (
            SELECT e.doc_id, e.lang, e.source,
                   coalesce(replace(e.seg, '<' || b.lhs || '><' || b.rhs || '>',
                                    '<' || b.lhs || b.rhs || '>'), e.seg) AS seg,
                   e.n_other
            FROM enc_{i - 1} e LEFT JOIN best_{i} b ON TRUE
        )""",
        )
    return ",\n".join(parts)
