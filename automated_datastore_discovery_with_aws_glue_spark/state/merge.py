"""MERGE semantics as a pure DataFrame transform (SURVEY §2.1 S8/S9, §2.3 J5).

The reference's state mutations are DynamoDB item ops:
- conditional insert  ``put_item(ConditionExpression="attribute_not_exists(id)")``
  (`lambda/glue-tracking-initial/app.py:221-228`)
- point update        ``update_item(Key, UpdateExpression="SET ...")``
  (`lambda/catalog-creator-s3/app.py:119-145`)

Both are the two WHEN-branches of ANSI MERGE. ``merge_frames`` computes
the post-MERGE state relationally:

    result = (target ⟕ source)      -- matched rows, optionally updated
           ∪ (source ∖ target.key)  -- not-matched rows, optionally inserted

Scale: the join is an equi-join on the merge key — broadcast when the
source batch is small (the common case: a trickle of events merging into
a large state table), shuffle-hash otherwise. On a real deployment the
state table would be stored partitioned/Z-ordered by the key so matched
partitions only are rewritten (copy-on-write); the logic here is
storage-agnostic and is reused by ParquetStateStore.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    *,
    set_on_match: dict[str, Column] | None = None,
    insert_not_matched: bool = True,
    broadcast_source: bool = True,
) -> DataFrame:
    """Return the state of ``target`` after MERGE-ing ``source``.

    - ``set_on_match=None`` + ``insert_not_matched=True``  -> S8
      conditional insert (existing rows never touched).
    - ``set_on_match={...}`` + ``insert_not_matched=False`` -> S9 point
      update (SET columns on matched keys only).
    - both on -> full upsert (J5 tracker self-merge).

    ``set_on_match`` maps column name -> expression over the joined row;
    source columns are available as ``src.<name>``.

    A NULL source merge key is rejected: the reference's
    ``put_item``/``update_item`` require the key, and a NULL key would
    silently miss the equi-join and fall through to the insert branch as
    an unmatchable row. The guard is LAZY — each key column is wrapped
    in a ``raise_error`` branch that fires executor-side during the
    merge's own evaluation (surfacing as a Spark runtime error naming
    the key), so no extra job re-evaluates the source lineage up front.

    Duplicate source keys: exact full-row duplicates (queue redelivery
    inside one batch) collapse via ``dropDuplicates`` — the common
    replay case merges cleanly. DISTINCT rows sharing a merge key are
    rejected (lazy in-plan guard, like the NULL check): a set-based
    MERGE has no arrival order to break the tie (the reference's
    sequential ``put_item`` does), and letting them through would
    multiply matched target rows and insert duplicate keys — ANSI MERGE
    raises on multiple matches for the same reason.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    keys = [key] if isinstance(key, str) else list(key)
    # full-row dedup; MAP columns (tracker attrs/tags) are not valid
    # set-operation keys, so they dedup through a sorted-entries
    # surrogate (deterministic, order-insensitive)
    dedup_cols: list[str] = []
    surrogates: list[str] = []
    for f in source.schema.fields:
        if isinstance(f.dataType, T.MapType):
            a = f"_dd_{f.name}"
            source = source.withColumn(
                a, F.array_sort(F.map_entries(F.col(f.name)))
            )
            dedup_cols.append(a)
            surrogates.append(a)
        else:
            dedup_cols.append(f.name)
    source = source.dropDuplicates(dedup_cols).drop(*surrogates)
    dup = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    source = source.withColumn(
        keys[0],
        F.when(
            dup > 1,
            F.raise_error(
                F.concat(
                    F.lit(
                        "merge_frames: multiple DISTINCT source rows share merge key "
                        f"{keys} (value: "
                    ),
                    F.col(keys[0]).cast("string"),
                    F.lit("); a set-based MERGE cannot order them — dedup upstream"),
                )
            ),
        ).otherwise(F.col(keys[0])),
    )
    for k in keys:
        source = source.withColumn(
            k,
            F.when(
                F.col(k).isNull(),
                F.raise_error(
                    F.lit(
                        f"merge_frames: NULL merge key '{k}' in source (key-value "
                        "point ops require the key); filter or repair before merging"
                    )
                ),
            ).otherwise(F.col(k)),
        )
    src = F.broadcast(source.alias("src")) if broadcast_source else source.alias("src")
    tgt = target.alias("tgt")

    cond = [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in keys]

    matched_flag = F.col(f"src.{keys[0]}").isNotNull()
    joined = tgt.join(src, cond, "left")
    matched_cols: list[Column] = []
    for c in target.columns:
        expr = F.col(f"tgt.{c}")
        if set_on_match and c in set_on_match:
            expr = F.when(matched_flag, set_on_match[c]).otherwise(expr)
        matched_cols.append(expr.alias(c))
    result = joined.select(*matched_cols)

    if insert_not_matched:
        # anti-join's right side is the (possibly huge) target key set —
        # never broadcast it; AQE picks SMJ/SHJ as sizes dictate
        inserts = source.alias("src").join(
            target.select(*keys).alias("tgt"), cond, "left_anti"
        )
        # align to target schema: missing columns -> NULL
        aligned = inserts.select(
            *[
                (F.col(c) if c in inserts.columns else F.lit(None)).cast(
                    dict(target.dtypes)[c]
                ).alias(c)
                for c in target.columns
            ]
        )
        result = result.unionByName(aligned)
    return result
