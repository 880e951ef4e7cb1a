"""Guard: no oracle SQL may emit a DuckDB HUGEINT output column.

DuckDB's ``sum()`` over integer inputs widens to HUGEINT (int128); the
driver's value-hash serializes int128 differently from Spark's
LongType even when the values are equal, so an uncast integer sum in
an oracle silently fails the hash compare (bit r6's
``pii_classify_counts``).  Every integer aggregate in an oracle must
be wrapped in ``CAST(... AS BIGINT)``.  This test type-checks every
declared oracle against DuckDB without executing the queries.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

_BANNED = {"HUGEINT", "UHUGEINT"}
_BANNED_PREFIXES = ("DECIMAL",)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_has_no_hugeint_columns(con, name):
    sql = entrymod.oracle_sql()[name]
    rel = con.sql(sql)
    offenders = [
        (cn, str(ct))
        for cn, ct in zip(rel.columns, rel.types)
        if str(ct) in _BANNED or str(ct).startswith(_BANNED_PREFIXES)
    ]
    assert not offenders, (
        f"{name} oracle emits column(s) {offenders} whose serialization "
        f"diverges from Spark's numeric types in the driver hash; CAST "
        f"to BIGINT / DOUBLE in the oracle SQL"
    )


def test_checker_normalize_rejects_array_column():
    """Regression for r7's ``mm_pixel_stats``: the driver canonicalizes
    every output column through pandas ``sort_values``/``factorize``,
    which crashes on list cells.  ``tools/check_oracle.py`` must mimic
    that strictness so an array-emitting query fails LOCALLY."""
    from tools.check_oracle import NonScalarColumn, normalize

    with pytest.raises(NonScalarColumn, match="luma_hist"):
        normalize([(1, [0.1, 0.9])], ["doc_id", "luma_hist"])
    with pytest.raises(NonScalarColumn, match="tags"):
        normalize([(1, {"k": "v"})], ["doc_id", "tags"])
    # scalar rows (incl. timestamps/bytes) still pass untouched
    import datetime

    cols, rows = normalize(
        [(1, "a", 0.5, b"\x00", datetime.datetime(2026, 1, 1))],
        ["id", "s", "f", "b", "ts"],
    )
    assert cols == ["b", "f", "id", "s", "ts"]
    assert len(rows) == 1
