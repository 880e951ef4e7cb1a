"""Sweeping plan-shape audit over the ENTIRE declared query surface.

Anti-patterns that must never appear in any `queries()` plan, at any
scale factor (plan-only — nothing executes):

- ``CartesianProduct`` — an unconstrained all-pairs join is the classic
  100 TB killer. (Broadcast nested-loop against a 1-row frame is a
  different node and legitimately appears in the kNN query-vector
  cross.)
- ``BatchEvalPython`` / ``ArrowEvalPython`` — row-at-a-time or scalar
  Python UDFs in a hot path; the engine's contract is JVM-side
  expressions everywhere, with Python only in ``mapInPandas`` media
  kernels (``MapInPandas`` nodes are allowed).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_cartesian_or_python_udf(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = _formatted(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    for node in ("BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, f"{name} plans a Python UDF ({node})"
    # the driver canonicalizes output through pandas sort_values, which
    # crashes on list/dict cells (r7's mm_pixel_stats) — every declared
    # query must emit atomic columns only
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not offenders, (
        f"{name} emits non-atomic output column(s) {offenders}; the "
        f"driver harness cannot canonicalize them — serialize or unnest"
    )
