"""Column classification — the engine's flagship operator (SURVEY A3).

Re-implements the capability of the reference's opaque managed transform
``EntityDetector().classify_columns(frame, entities, sample_fraction,
detection_threshold)`` (`scripts/glue/s3-source/s3-source-script.py:302-308`)
as a native Spark plan:

1. (optional) ``df.sample(fraction)`` — at 100 TB sampling is the main
   cost lever; the reference hardcodes 1.0 (full scan).
2. Unpivot the selected columns to ``(columnName, value)`` with
   ``stack`` — executor-local, no shuffle; memory amplification is
   bounded by batch size, not table size.
3. ONE hash aggregate keyed by ``columnName`` computing, per entity,
   ``avg(value rlike anchored_regex)`` over non-null values. Map-side
   partial aggregation means the shuffle carries only
   ``#columns x #partitions`` rows regardless of input size — the whole
   classify of a 100 TB table is a single pass with a KB-scale shuffle.
4. Threshold + ``collect_list`` to the reference's output shape
   ``{columnName: [entityTypes]}``.

No driver-side collect happens inside the operator (the reference
collects the classified map to the driver at `:309`; we stay
distributed and return DataFrames).

Row-at-a-time Python UDFs are never used; everything is JVM-side
``rlike`` under whole-stage codegen. Checksum validators (Luhn etc.) are
native expression trees too — see ``luhn_valid``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from automated_datastore_discovery_with_aws_glue_spark.functions.entities import (
    EntitySpec,
    resolve_entities,
)


def luhn_valid(col: Column) -> Column:
    """Luhn checksum (public ISO/IEC 7812-1 algorithm) as a pure Spark
    expression tree — used to harden CREDIT_CARD detection without a UDF.

    Strips separators, reverses the digit string, doubles every second
    digit (summing the two digits of products > 9), and checks mod 10.
    """
    digits = F.regexp_replace(col, "[^0-9]", "")
    # reversed char array -> 1-indexed positions via transform index
    rev = F.reverse(digits)
    chars = F.split(rev, "")
    summed = F.aggregate(
        F.zip_with(
            chars,
            F.sequence(F.lit(1), F.length(rev)),
            lambda ch, idx: F.when(
                idx % 2 == 0,
                # doubled digit, summed decimal digits: 2d - 9 if 2d > 9
                F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                    ch.cast("int") * 2
                ),
            ).otherwise(ch.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (F.length(digits) >= 12) & (summed % 10 == 0)


def mod97_valid(col: Column) -> Column:
    """ISO 13616 / ISO 7064 mod-97 IBAN checksum as a pure expression tree.

    Applies only to IBAN-shaped values (two letters + two digits prefix):
    the national bank-account entities accept either an IBAN or a
    domestic layout, and domestic layouts carry no mod-97 check — those
    pass through on the format regex alone. For IBAN-shaped values the
    first four chars rotate to the end, letters map to 10..35, and the
    resulting big integer must be ≡ 1 (mod 97) — folded per character so
    no arbitrary-precision arithmetic is needed.
    """
    cleaned = F.upper(F.regexp_replace(col, "[^0-9A-Za-z]", ""))
    rearranged = F.concat(F.substring(cleaned, 5, 1000), F.substring(cleaned, 1, 4))
    rem = F.aggregate(
        F.split(rearranged, ""),
        F.lit(0),
        lambda acc, ch: F.when(
            ch.rlike("^[0-9]$"), (acc * 10 + ch.cast("int")) % 97
        ).otherwise((acc * 100 + (F.ascii(ch) - 55)) % 97),
    )
    looks_iban = cleaned.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")
    return F.when(looks_iban, rem == 1).otherwise(F.lit(True))


def nhs_valid(col: Column) -> Column:
    """UK NHS number check digit (public ISO 7064 mod-11 variant): the
    first nine digits weighted 10..2, check = 11 - (sum mod 11), where 11
    maps to 0 and 10 is invalid; must equal the tenth digit."""
    digits = F.regexp_replace(col, "[^0-9]", "")
    first9 = F.slice(F.split(digits, ""), 1, 9)
    weighted = F.aggregate(
        F.zip_with(first9, F.sequence(F.lit(10), F.lit(2)), lambda ch, w: ch.cast("int") * w),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    check = 11 - (weighted % 11)
    expected = F.when(check == 11, 0).otherwise(check)
    actual = F.element_at(F.split(digits, ""), 10).cast("int")
    return (F.length(digits) == 10) & (check != 10) & (expected == actual)


_VALIDATORS = {"luhn": luhn_valid, "mod97": mod97_valid, "nhs": nhs_valid}


def _match_expr(value: Column, spec: EntitySpec, validate: bool) -> Column:
    matched = value.rlike(spec.anchored)
    if validate and spec.validator in _VALIDATORS:
        matched = matched & _VALIDATORS[spec.validator](value)
    return matched


def _string_columns(df: DataFrame, columns: Sequence[str] | None) -> list[str]:
    if columns is not None:
        return list(columns)
    return [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]


#: internal suffix marking exact-sub-form rows in the long frame; cannot
#: collide with registry names (those are upper-case identifiers)
_EXACT_MARK = "!exact"


def classify_columns_long(
    df: DataFrame,
    entities: Sequence[str] | None = None,
    sample_fraction: float = 1.0,
    *,
    columns: Sequence[str] | None = None,
    validate: bool = False,
    seed: int = 42,
    _exact_forms: bool = False,
) -> DataFrame:
    """Per-(column, entity) match fractions — the classifier's long form.

    Returns ``(columnName, entity, match_fraction)`` with the fraction of
    *non-null* sampled values fully matching the entity's format, rounded
    to 4 decimals (deterministic across engines).

    ``_exact_forms`` (internal, used by :func:`classify_columns`'s
    context gate) additionally emits, for approximate specs that declare
    an ``exact_pattern``, rows named ``<entity>!exact`` carrying the
    fraction matching only the fully-determined sub-form — still within
    the same single stack + hash aggregate (extra agg expressions, not an
    extra pass).
    """
    specs = resolve_entities(list(entities) if entities is not None else None)
    cols = _string_columns(df, columns)
    if not cols:
        # a table with zero string columns is a NORMAL discovered source
        # (all-numeric/timestamp): zero findings, not an error — raising
        # here would abort the engine's whole classify_pending batch
        spark = df.sparkSession
        return spark.createDataFrame(
            [],
            "columnName string, entity string, match_fraction double",
        )

    if sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)

    # unpivot: stack(n, 'col1', col1, 'col2', col2, ...) -> (columnName, value)
    stack_args: list[Column] = []
    for c in cols:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c).cast("string"))
    stacked = df.select(
        F.stack(F.lit(len(cols)), *stack_args).alias("columnName", "raw_value")
    ).select("columnName", F.trim(F.col("raw_value")).alias("value"))

    def _frac(matched: Column) -> Column:
        return F.round(
            F.avg(
                F.when(F.col("value").isNull() | (F.col("value") == ""), None)
                .when(matched, 1.0)
                .otherwise(0.0)
            ),
            4,
        )

    agg_names: list[str] = []
    aggs: list[Column] = []
    for s in specs:
        agg_names.append(s.name)
        aggs.append(_frac(_match_expr(F.col("value"), s, validate)).alias(s.name))
        if _exact_forms and s.approximate and s.exact_pattern:
            exact_name = s.name + _EXACT_MARK
            matched = F.col("value").rlike(s.anchored_exact)
            if validate and s.validator in _VALIDATORS:
                matched = matched & _VALIDATORS[s.validator](F.col("value"))
            agg_names.append(exact_name)
            aggs.append(_frac(matched).alias(exact_name))
    wide = stacked.groupBy("columnName").agg(*aggs)

    # wide -> long without a second shuffle (stack is a projection)
    unstack_args: list[Column] = []
    for name in agg_names:
        unstack_args.append(F.lit(name))
        unstack_args.append(F.col(name))
    return wide.select(
        "columnName",
        F.stack(F.lit(len(agg_names)), *unstack_args).alias("entity", "match_fraction"),
    )


def classify_columns(
    df: DataFrame,
    entities: Sequence[str] | None = None,
    sample_fraction: float = 1.0,
    detection_threshold: float = 0.1,
    *,
    columns: Sequence[str] | None = None,
    validate: bool = False,
    use_context: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Reference-shaped output: one row per column with detections —
    ``(columnName, entityTypes array<string>)``, entity list sorted.

    Signature mirrors ``EntityDetector.classify_columns`` (reference
    `scripts/glue/s3-source/s3-source-script.py:302-308`; defaults 1.0 /
    0.1 per `:305-307`); columns with no detected entity are omitted,
    matching the reference's dict semantics.

    ``use_context`` gates ``approximate=True`` entities (formats not
    fully determined by a regex — generic digit runs, name heuristics)
    on their ``EntitySpec.context`` column-name hints: a 10-digit column
    named ``phone`` reads as PHONE_NUMBER, the same values under
    ``account_number`` as BANK_ACCOUNT. The hint check is resolved
    driver-side from the schema (column names are known before any data
    moves), so it adds zero executor work. Exact-format entities are
    never gated.
    """
    specs = resolve_entities(list(entities) if entities is not None else None)
    long_df = classify_columns_long(
        df,
        entities,
        sample_fraction,
        columns=columns,
        validate=validate,
        seed=seed,
        _exact_forms=use_context,
    )
    return _finalize_classification(
        long_df,
        specs,
        _string_columns(df, columns),
        detection_threshold=detection_threshold,
        use_context=use_context,
    )


def _finalize_classification(
    long_df: DataFrame,
    specs: list[EntitySpec],
    cols: Sequence[str],
    *,
    detection_threshold: float,
    use_context: bool,
) -> DataFrame:
    """Threshold + context gate + collect, shared by the direct
    (fraction) path and the mergeable count path: takes the long frame
    ``(columnName, entity, match_fraction)`` — with ``!exact`` marker
    rows when ``use_context`` — and produces the reference-shaped
    ``(columnName, entityTypes)``."""
    keep = F.col("match_fraction") >= detection_threshold
    has_exact = [s.name for s in specs if s.approximate and s.exact_pattern]
    if has_exact:
        # fold the ``<entity>!exact`` rows back onto their base row as
        # an ``exact_fraction`` column. A re-group (not a self-join):
        # the long frame is already aggregated to #cols x #entities
        # rows, so this second groupBy shuffles KBs — a self-join
        # would instead recompute the data-scale scan for both sides.
        # The fold runs regardless of ``use_context`` — a counts table
        # written with ``exact_forms=True`` must never surface its
        # internal marker rows as bogus entity names.
        is_mark = F.col("entity").endswith(_EXACT_MARK)
        base_entity = F.when(
            is_mark,
            F.expr(f"substring(entity, 1, length(entity) - {len(_EXACT_MARK)})"),
        ).otherwise(F.col("entity"))
        long_df = (
            long_df.groupBy("columnName", base_entity.alias("entity"))
            .agg(
                F.max(F.when(~is_mark, F.col("match_fraction"))).alias("match_fraction"),
                F.max(F.when(is_mark, F.col("match_fraction"))).alias("exact_fraction"),
            )
        )
    if use_context:
        approx = [s.name for s in specs if s.approximate]
        hinted = [
            f"{c}\x00{s.name}"
            for s in specs
            if s.approximate
            for c in cols
            if any(h in c.lower() for h in s.context)
        ]
        if has_exact:
            exact_ok = F.coalesce(F.col("exact_fraction"), F.lit(0.0)) >= detection_threshold
        else:
            exact_ok = F.lit(False)
        if approx:
            is_hinted = (
                F.concat_ws("\x00", F.col("columnName"), F.col("entity")).isin(hinted)
                if hinted
                else F.lit(False)
            )
            # approximate entities need a column-name hint — unless the
            # column's values clear the threshold on the exact sub-form
            # alone (fully determined by the format; no hint required)
            keep = keep & (~F.col("entity").isin(approx) | is_hinted | exact_ok)
    return (
        long_df.filter(keep)
        .groupBy("columnName")
        .agg(F.sort_array(F.collect_list("entity")).alias("entityTypes"))
    )


def classify_columns_counts(
    df: DataFrame,
    entities: Sequence[str] | None = None,
    *,
    columns: Sequence[str] | None = None,
    validate: bool = False,
    file_col: Column | None = None,
    exact_forms: bool = True,
) -> DataFrame:
    """The MERGEABLE form of classification: per-(column, entity) match
    COUNTS instead of fractions — ``(columnName, entity, n_matched,
    n_values)``, optionally keyed by ``file_col`` (e.g.
    ``F.input_file_name()``) for per-file attribution.

    Fractions are not additive across file subsets; counts are. This is
    what makes file-level incremental classification exact: classify only
    the new/changed files of a source, store their counts, and derive the
    source's classification from the SUM over its current files —
    bit-identical to a full rescan (``sum(matched)/sum(values)`` is the
    same double ``avg`` computes). The reference re-scans every source in
    full on every run (its job bookmark is disabled,
    `lambda/s3-glue-job-creator/app.py:17`).

    Same single stack + hash aggregate shape as
    :func:`classify_columns_long`; the shuffle carries
    ``#files x #columns`` keys, still metadata-scale.

    ``exact_forms=True`` also emits ``<entity>!exact`` rows for
    approximate specs with an ``exact_pattern`` so the downstream
    context gate (:func:`classification_from_counts`) can replay
    :func:`classify_columns`'s exact-sub-form escape.
    """
    specs = resolve_entities(list(entities) if entities is not None else None)
    cols = _string_columns(df, columns)
    spark = df.sparkSession
    out_schema = "file string, columnName string, entity string, n_matched long, n_values long"
    if not cols:
        return spark.createDataFrame([], out_schema if file_col is not None else out_schema.split(", ", 1)[1])

    stack_args: list[Column] = []
    for c in cols:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c).cast("string"))
    pre = [file_col.alias("file")] if file_col is not None else []
    keys = ["file", "columnName"] if file_col is not None else ["columnName"]
    stacked = df.select(
        *pre, F.stack(F.lit(len(cols)), *stack_args).alias("columnName", "raw_value")
    ).select(*keys, F.trim(F.col("raw_value")).alias("value"))

    empty = F.col("value").isNull() | (F.col("value") == "")
    agg_names: list[str] = []
    aggs: list[Column] = [
        F.sum(F.when(~empty, 1).otherwise(0)).alias("__n_values")
    ]
    for s in specs:
        agg_names.append(s.name)
        aggs.append(
            F.sum(
                F.when(~empty & _match_expr(F.col("value"), s, validate), 1).otherwise(0)
            ).alias(s.name)
        )
        if exact_forms and s.approximate and s.exact_pattern:
            matched = F.col("value").rlike(s.anchored_exact)
            if validate and s.validator in _VALIDATORS:
                matched = matched & _VALIDATORS[s.validator](F.col("value"))
            exact_name = s.name + _EXACT_MARK
            agg_names.append(exact_name)
            aggs.append(F.sum(F.when(~empty & matched, 1).otherwise(0)).alias(exact_name))
    wide = stacked.groupBy(*keys).agg(*aggs)

    unstack_args: list[Column] = []
    for name in agg_names:
        unstack_args.append(F.lit(name))
        unstack_args.append(F.col(name))
    return wide.select(
        *keys,
        F.stack(F.lit(len(agg_names)), *unstack_args).alias("entity", "n_matched"),
        F.col("__n_values").alias("n_values"),
    )


def classification_from_counts(
    counts: DataFrame,
    entities: Sequence[str] | None = None,
    detection_threshold: float = 0.1,
    *,
    column_names: Sequence[str] | None = None,
    use_context: bool = True,
) -> DataFrame:
    """Derive the reference-shaped ``(columnName, entityTypes)`` from
    (possibly per-file, possibly multi-pass) match counts: sum, divide,
    then the SAME threshold + context gate as :func:`classify_columns`.
    ``column_names`` feeds the context gate's hint check (defaults to the
    distinct columns present in ``counts``, resolved driver-side — the
    frame is metadata-scale)."""
    specs = resolve_entities(list(entities) if entities is not None else None)
    summed = counts.groupBy("columnName", "entity").agg(
        F.sum("n_matched").alias("n_matched"), F.sum("n_values").alias("n_values")
    )
    long_df = summed.select(
        "columnName",
        "entity",
        F.when(
            F.col("n_values") > 0,
            F.round(F.col("n_matched") / F.col("n_values"), 4),
        ).alias("match_fraction"),
    )
    if column_names is None:
        column_names = [r[0] for r in counts.select("columnName").distinct().collect()]
    return _finalize_classification(
        long_df,
        specs,
        list(column_names),
        detection_threshold=detection_threshold,
        use_context=use_context,
    )


def build_findings(
    classified: DataFrame,
    *,
    data_source_type: str,
    data_catalog_table: str,
    data_catalog_database: str,
    region: str = "local",
    source_attrs: dict[str, str] | None = None,
) -> DataFrame:
    """Decorate a classification result into PII-findings rows — the
    reference's withColumn chain (`scripts/glue/s3-source/s3-source-script.py:318-328`),
    with the builtin ``uuid()`` instead of its Python-UDF uuid (`:318`).
    """
    out = (
        classified.withColumn("id", F.expr("uuid()"))
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("data_source_type", F.lit(data_source_type))
        .withColumn("data_catalog_table", F.lit(data_catalog_table))
        .withColumn("data_catalog_database", F.lit(data_catalog_database))
        .withColumn("region", F.lit(region))
    )
    for k, v in (source_attrs or {}).items():
        out = out.withColumn(k, F.lit(v))
    return out


# ---------------------------------------------------------------------------
# Redaction — the scrubbing half of the PII pipeline (classify -> redact)
# ---------------------------------------------------------------------------

def redact_cells(
    df: DataFrame,
    entities: Sequence[str] | None = None,
    *,
    columns: Sequence[str] | None = None,
    validate: bool = False,
    token_fmt: str = "[{name}]",
) -> DataFrame:
    """Cell-level PII scrubbing: every string cell that FULLY matches an
    entity's anchored pattern (optionally checksum-validated — the same
    ``_match_expr`` the classifier uses) is replaced by a typed mask
    token; everything else passes through unchanged. The reference stops
    at classification (`lambda/pii-report/app.py` writes findings); a
    training-data pipeline needs the scrub step itself, and cell
    granularity matches the classifier's definition of "contains PII".

    One projection, JVM regexes, no UDF: per column the entity checks
    chain into a single CASE expression evaluated in one pass. First
    matching entity (registry order) names the token — deterministic."""
    specs = resolve_entities(list(entities) if entities is not None else None)
    cols = set(_string_columns(df, columns))
    out = []
    for field in df.columns:
        if field not in cols:
            out.append(F.col(field))
            continue
        value = F.trim(F.col(field))
        expr = F.col(field)
        for spec in reversed(specs):
            expr = F.when(
                _match_expr(value, spec, validate), F.lit(token_fmt.format(name=spec.name))
            ).otherwise(expr)
        out.append(expr.alias(field))
    return df.select(*out)


def redaction_order(specs):
    """Application order for the in-prose replacement chain:
    LONGEST-pattern-first. A long structured run (a 16-digit credit
    card) must be claimed by ITS pattern before a shorter digit-run
    pattern (phone) can consume a prefix of it and leave the suffix
    unmasked — the partial-mask leak. Pattern string length is a
    deterministic proxy for maximum match length across the registry's
    format regexes (name tiebreak); shared with the DuckDB oracle
    builder so the chains can't drift."""
    return sorted(specs, key=lambda s: (-len(s.pattern), s.name))


def redaction_pattern(spec) -> str:
    """RE2-compatible in-prose pattern: optional leading '+' OUTSIDE the
    word boundary (``\\b`` cannot sit between a space and '+', so a
    phone's '+' would otherwise stay unmasked in front of the token) +
    word-boundary-wrapped body. No lookarounds — DuckDB's RE2 replays
    the identical chain."""
    return f"[+]?\\b(?:{spec.pattern})\\b"


def redact_text(
    col: Column,
    entities: Sequence[str] | None = None,
    *,
    token_fmt: str = "[{name}]",
) -> Column:
    """Free-text PII redaction: replace in-text occurrences of each
    entity's pattern (word-boundary wrapped, longest-pattern-first —
    see :func:`redaction_order` / :func:`redaction_pattern`) with a
    typed mask token — chained ``regexp_replace``, one projection, no
    UDF.

    The anchoring is RE2-compatible, so the DuckDB oracle replays the
    identical replacement chain. Best-effort by nature: the registry's
    patterns are cell-format regexes, and in free prose a boundary-less
    format (e.g. digits inside a longer run) won't match — cell-level
    scrubbing (:func:`redact_cells`) is the precise tool for structured
    columns. Already-masked spans are never re-matched (replacement
    tokens contain no word-boundary pattern starts)."""
    specs = resolve_entities(list(entities) if entities is not None else None)
    expr = col
    for spec in redaction_order(specs):
        expr = F.regexp_replace(
            expr, redaction_pattern(spec), token_fmt.format(name=spec.name)
        )
    return expr
