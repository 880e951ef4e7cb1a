"""Declarative data-quality constraint suites (Deequ-style checks).

Public shape: Schelter et al. 2018, "Automating Large-Scale Data Quality
Verification" (VLDB — the Deequ system): a suite of declarative
constraints evaluates to one METRIC per constraint plus a pass/fail
against a threshold, in as few passes over the data as possible.

The reference's discovery pipeline classifies and profiles columns
(`glue_jobs`, SURVEY §2.5) but has no assertable quality gate — this is
the layer a user puts BETWEEN discovery and consumption ("fail the
pipeline if completeness(email) < 0.99").

Pass structure (the 100 TB property):

- ALL completeness + compliance constraints on one table fold into ONE
  aggregate over one scan — adding a constraint adds a column to the
  agg, never a pass. The single row is unpivoted driver-side (it is one
  row of metadata, not data).
- each uniqueness constraint is one groupBy on its key columns (the
  group-count distribution is irreducible); the shuffle carries
  (key, partial count) pairs only.
- each referential-integrity constraint is one LEFT SEMI-count against
  the DISTINCT referenced keys (broadcast when the dimension is small,
  shuffle join otherwise — AQE decides from the distinct key size).

``passed`` compares the 4dp-ROUNDED metric to the threshold, so the
report is bit-portable across engines (a sum-order ulp can never flip a
pass/fail at the boundary).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Completeness:
    """Fraction of rows with ``col`` non-null."""

    col: str
    threshold: float = 1.0

    @property
    def name(self) -> str:
        return f"completeness({self.col})"


@dataclass(frozen=True)
class Compliance:
    """Fraction of rows satisfying ``predicate`` (NULL counts as
    non-compliant — a constraint an unparseable row silently satisfies
    is no constraint)."""

    label: str
    predicate: Column = field(compare=False)
    threshold: float = 1.0

    @property
    def name(self) -> str:
        return f"compliance({self.label})"


@dataclass(frozen=True)
class Uniqueness:
    """Deequ uniqueness: fraction of ROWS whose key value occurs exactly
    once (1.0 = a true primary key)."""

    cols: tuple[str, ...]
    threshold: float = 1.0

    @property
    def name(self) -> str:
        return f"uniqueness({','.join(self.cols)})"


@dataclass(frozen=True)
class ReferentialIntegrity:
    """Fraction of rows whose ``col`` value exists in ``ref[ref_col]``
    (NULL foreign keys count as violations, like Compliance)."""

    col: str
    ref: DataFrame = field(compare=False)
    ref_col: str = ""
    ref_name: str = "ref"
    threshold: float = 1.0

    @property
    def name(self) -> str:
        return f"referential({self.col} in {self.ref_name}.{self.ref_col})"


Check = Completeness | Compliance | Uniqueness | ReferentialIntegrity


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate the suite; returns ``(constraint, metric, passed)`` —
    metric rounded to 4dp, ``passed`` judged on the rounded value."""
    spark = df.sparkSession
    scalar_exprs: list[Column] = []
    scalar_meta: list[tuple[str, float]] = []
    frames: list[DataFrame] = []

    def _ratio_frame(name: str, metric: Column, threshold: float, src: DataFrame) -> DataFrame:
        # empty-table semantics: a ratio over zero rows is undefined —
        # metric NULL, passed FALSE (a gate must return a verdict, and
        # "no rows" never vouches for quality)
        m = F.round(metric, 4)
        return src.select(
            F.lit(name).alias("constraint"),
            m.alias("metric"),
            F.coalesce(m >= threshold, F.lit(False)).alias("passed"),
        )

    for c in checks:
        if isinstance(c, Completeness):
            scalar_exprs.append(
                F.avg(F.col(c.col).isNotNull().cast("double")).alias(
                    f"_m{len(scalar_meta)}"
                )
            )
            scalar_meta.append((c.name, c.threshold))
        elif isinstance(c, Compliance):
            scalar_exprs.append(
                F.avg(
                    F.coalesce(c.predicate, F.lit(False)).cast("double")
                ).alias(f"_m{len(scalar_meta)}")
            )
            scalar_meta.append((c.name, c.threshold))
        elif isinstance(c, Uniqueness):
            counts = df.groupBy(*c.cols).agg(F.count(F.lit(1)).alias("_n"))
            metric = F.sum(F.when(F.col("_n") == 1, 1).otherwise(0)) / F.sum(
                "_n"
            )
            frames.append(
                _ratio_frame(
                    c.name,
                    F.col("_m"),
                    c.threshold,
                    counts.agg(metric.cast("double").alias("_m")),
                )
            )
        elif isinstance(c, ReferentialIntegrity):
            keys = c.ref.select(F.col(c.ref_col).alias(c.col)).distinct()
            hit = df.select(c.col).join(keys, c.col, "left_semi")
            n_all = df.agg(F.count(F.lit(1)).alias("_d"))
            n_hit = hit.agg(F.count(F.lit(1)).alias("_h"))
            frames.append(
                _ratio_frame(
                    c.name,
                    # guard 0/0 on an empty table (ANSI divide-by-zero);
                    # NULL metric → passed false via _ratio_frame
                    F.when(
                        F.col("_d") > 0, F.col("_h") / F.col("_d")
                    ).cast("double"),
                    c.threshold,
                    n_hit.crossJoin(n_all),
                )
            )
        else:  # pragma: no cover - exhaustive by construction
            raise TypeError(f"unknown check {c!r}")

    if scalar_exprs:
        # one row of metadata; unpivot via explode-of-structs (stays a
        # single scan + single-row shuffle-free aggregate)
        one = df.agg(*scalar_exprs)
        frames.insert(
            0,
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("constraint"),
                                F.round(F.col(f"_m{i}"), 4).alias("metric"),
                                # avg over 0 rows is NULL → passed false
                                # (same empty-table semantics as the
                                # ratio frames)
                                F.coalesce(
                                    F.round(F.col(f"_m{i}"), 4) >= thr,
                                    F.lit(False),
                                ).alias("passed"),
                            )
                            for i, (name, thr) in enumerate(scalar_meta)
                        ]
                    )
                ).alias("r")
            ).select("r.*"),
        )

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("constraint")
